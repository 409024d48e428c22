"""Training entry point.

Usage parity with the reference (`python train.py --config ...`,
/root/reference/src/train.py:532-542):

    python -m ibl_nerf_tpu.cli.train --config configs/IBL-NeRF/kitchen/IBL-NeRF.txt
"""

from __future__ import annotations

from ibl_nerf_tpu.cli.config import export_config, parse_with_includes
from ibl_nerf_tpu.train.loop import train


def main(argv=None):
    args = parse_with_includes(argv)
    export_config(args, args.basedir)
    train(args)


if __name__ == "__main__":
    main()
