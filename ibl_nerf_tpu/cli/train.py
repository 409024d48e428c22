"""Training entry point.

Usage parity with the reference (`python train.py --config ...`,
/root/reference/src/train.py:532-542):

    python -m ibl_nerf_tpu.cli.train --config configs/IBL-NeRF/kitchen/IBL-NeRF.txt
"""

from __future__ import annotations

from ibl_nerf_tpu.cli.config import export_config, parse_with_includes
from ibl_nerf_tpu.train.loop import train


def main(argv=None):
    from ibl_nerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = parse_with_includes(argv)
    if getattr(args, "num_processes", 0) and args.num_processes > 1:
        from ibl_nerf_tpu.parallel import distributed as dist

        pid, _ = dist.initialize(args.coordinator_address,
                                 args.num_processes, args.process_id)
        if pid == 0:
            export_config(args, args.basedir)
    else:
        export_config(args, args.basedir)
    train(args)


if __name__ == "__main__":
    main()
