"""Aggregate reference_anchor runs into the RESULTS.md campaign table.

Collects every /tmp/anchor_*/reference_anchor.json (plus the round-3
/tmp/ref_anchor seed-0 both-sides run), groups into:
  - independent-init pairs: ours seed N vs torch seed N,
  - same-init pairs: both sides trained from the torch seed-0 init with
    varying batch streams,
and prints per-buffer PSNR/SSIM rows + side means.

    python scripts/anchor_report.py [--glob '/tmp/anchor_*']
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np

BUFS = ("image", "radiance", "albedo", "irradiance")


def load_runs(patterns):
    rows = []
    for pat in patterns:
        for d in sorted(glob.glob(pat)):
            # accept run dirs (live /tmp layout) or bare .json files
            # (the committed docs/data/anchor archive)
            p = (d if d.endswith(".json")
                 else os.path.join(d, "reference_anchor.json"))
            if not os.path.exists(p):
                continue
            d = d[:-len(".json")] if d.endswith(".json") else d
            with open(p) as f:
                rep = json.load(f)
            if rep.get("iters") != 4000:
                continue        # smoke runs etc.
            for side in ("ours", "reference"):
                if side not in rep:
                    continue
                if side == "ours" and os.path.basename(d) == "ref_anchor":
                    # the round-3 pre-fix seed-0 collapse (documented in
                    # RESULTS.md); superseded by anchor_ours_s0
                    continue
                rows.append({
                    "dir": os.path.basename(d),
                    "side": side,
                    "seed": rep.get("seed"),
                    "stream": rep.get("ref_stream_seed",
                                      rep.get("seed")),
                    "same_init": bool(rep.get("ours_init_port")
                                      or "ref_stream_seed" in rep
                                      or "sameinit" in d),
                    "m": rep[side]["metrics"],
                })
    # passing both the live /tmp dirs and the committed docs/data/anchor
    # archive must not double-count runs in the campaign means (ADVICE
    # r4): dedup on the identifying tuple, first occurrence wins.
    seen, unique = set(), []
    for r in rows:
        key = (r["dir"], r["side"], r["seed"], r["stream"])
        if key in seen:
            continue
        seen.add(key)
        unique.append(r)
    return unique


def table(rows, title):
    if not rows:
        return
    print(f"\n### {title}")
    hdr = ["run", "side"] + [f"{b} PSNR" for b in BUFS] + ["image SSIM"]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for r in rows:
        vals = [r["dir"], r["side"]]
        vals += [f"{r['m'][b]['psnr']:.2f}" if b in r["m"] else "-"
                 for b in BUFS]
        vals += [f"{r['m']['image']['ssim']:.4f}"]
        print("| " + " | ".join(vals) + " |")
    for side in ("reference", "ours"):
        sel = [r for r in rows if r["side"] == side]
        if not sel:
            continue
        means = [np.mean([r["m"][b]["psnr"] for r in sel if b in r["m"]])
                 for b in BUFS]
        ssim = np.mean([r["m"]["image"]["ssim"] for r in sel])
        print(f"| **mean {side} (n={len(sel)})** | | "
              + " | ".join(f"**{v:.2f}**" for v in means)
              + f" | **{ssim:.4f}** |")


def main():
    ap = argparse.ArgumentParser("anchor_report")
    ap.add_argument("--glob", nargs="+",
                    default=["/tmp/anchor_*", "/tmp/ref_anchor"])
    args = ap.parse_args()
    rows = load_runs(args.glob)
    same = [r for r in rows if r["same_init"]]
    indep = [r for r in rows if not r["same_init"]]
    # the round-3 /tmp/ref_anchor seed-0 torch run doubles as the
    # same-init stream-0 torch sample (its init IS the ported init)
    for r in indep:
        if r["dir"] == "ref_anchor" and r["side"] == "reference":
            same.append({**r, "dir": r["dir"] + " (st0)"})
    table(indep, "independent-init pairs (ours seed N vs torch seed N)")
    table(same, "same-init study (torch seed-0 init, varied batch "
                "streams)")


if __name__ == "__main__":
    main()
