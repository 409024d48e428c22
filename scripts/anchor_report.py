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


def load_replays(patterns):
    """stream_replay.py artifacts: ours trained on torch's EXACT pixel
    stream. Keyed by stream seed; dedup (live /tmp + committed archive),
    first occurrence wins."""
    out = {}
    for pat in patterns:
        for d in sorted(glob.glob(pat)):
            p = (d if d.endswith(".json")
                 else os.path.join(d, "stream_replay.json"))
            if not os.path.exists(p):
                continue
            with open(p) as f:
                rep = json.load(f)
            if rep.get("iters") != 4000:
                continue
            out.setdefault(rep["stream_seed"], rep["metrics"])
    return out


def matched_stream_table(torch_rows, replays):
    """The Δ distribution on MATCHED streams: for each torch stream N,
    ours-replaying-that-exact-stream minus the torch run (same init,
    same pixel sequence). mean/σ/sign count is the statistic the
    stream-parity claim rests on (VERDICT r4 item 2)."""
    torch_by_stream = {r["stream"]: r["m"] for r in torch_rows
                       if r["side"] == "reference"}
    streams = sorted(set(torch_by_stream) & set(replays))
    if not streams:
        return
    print("\n### matched-stream pairs (same init + torch's exact pixel "
          "stream)")
    hdr = (["stream"] + [f"Δ{b} PSNR" for b in BUFS] + ["Δimage SSIM"])
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    deltas = {b: [] for b in BUFS}
    dssim = []
    for st in streams:
        t, o = torch_by_stream[st], replays[st]
        row = [str(st)]
        for b in BUFS:
            if b in t and b in o:
                d = o[b]["psnr"] - t[b]["psnr"]
                deltas[b].append(d)
                row.append(f"{d:+.2f}")
            else:
                row.append("-")
        ds = o["image"]["ssim"] - t["image"]["ssim"]
        dssim.append(ds)
        row.append(f"{ds:+.4f}")
        print("| " + " | ".join(row) + " |")
    summ = []
    for b in BUFS:
        a = np.asarray(deltas[b])
        summ.append(f"{np.mean(a):+.2f}±{np.std(a):.2f}")
    print(f"| **mean±σ (n={len(streams)})** | " + " | ".join(summ)
          + f" | {np.mean(dssim):+.4f} |")
    img = np.asarray(deltas["image"])
    print(f"\nimage Δ sign count: ours ahead on {int(np.sum(img > 0))}"
          f"/{len(img)} matched streams; |mean Δ| = "
          f"{abs(np.mean(img)):.2f} dB vs per-stream σ = "
          f"{np.std(img):.2f} dB")


def main():
    ap = argparse.ArgumentParser("anchor_report")
    ap.add_argument("--glob", nargs="+",
                    default=["/tmp/anchor_*", "/tmp/ref_anchor"])
    ap.add_argument("--replay_glob", nargs="+",
                    default=["/tmp/stream_replay_st*"])
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
    matched_stream_table(same, load_replays(args.replay_glob))


if __name__ == "__main__":
    main()
