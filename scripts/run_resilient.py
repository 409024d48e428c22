"""Resilient launcher for long TPU training runs.

The axon tunnel wedges long-running device calls every few hours
(observed 3× in one night, ~2.5 h apart: process alive at ~5% CPU, no
metrics writes, blocked in a device call — see CLAUDE.md). Training
already checkpoints periodically and auto-resumes, so the correct
recovery is: detect the stall, kill the EXACT child PID, relaunch, let
orbax restore the latest checkpoint.

Correct stall detection (the naive version bit us): a freshly launched
process waiting on the device claim has a stale-or-missing heartbeat
file and must NOT be killed (claims can take 30 s - 20 min). Only
declare a stall when the heartbeat file's mtime has ADVANCED past this
attempt's launch time (training really started) and then goes stale
for --stall_sec.

    python scripts/run_resilient.py --heartbeat <dir>/metrics.jsonl \
        --done <dir>/kitchen_gate.json [--stall_sec 600] [--max_tries 8] \
        -- python scripts/kitchen_gate.py ...

Generic: works for any command that (a) appends to a heartbeat file
while making progress and (b) produces a done-file on success.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def mtime(path):
    try:
        return os.stat(path).st_mtime
    except OSError:
        return None


def run_once(cmd, heartbeat, stall_sec, claim_grace_sec, log,
             poll_sec=30):
    start = time.time()
    proc = subprocess.Popen(cmd)
    started_training = False
    try:
        while True:
            try:
                proc.wait(timeout=poll_sec)
                return proc.returncode, started_training
            except subprocess.TimeoutExpired:
                pass
            hb = mtime(heartbeat)
            now = time.time()
            if hb is not None and hb > start:
                started_training = True
                if now - hb > stall_sec:
                    log(f"stall: heartbeat {now - hb:.0f}s stale, "
                        f"killing pid {proc.pid}")
                    proc.send_signal(signal.SIGTERM)
                    try:
                        proc.wait(timeout=30)
                    except subprocess.TimeoutExpired:
                        proc.kill()
                        proc.wait()
                    return None, started_training
            elif now - start > claim_grace_sec:
                # never produced a heartbeat at all — claim wedged or
                # the command is broken; give up on this attempt
                log(f"no heartbeat after {now - start:.0f}s, "
                    f"killing pid {proc.pid}")
                proc.send_signal(signal.SIGTERM)
                try:
                    proc.wait(timeout=30)
                except subprocess.TimeoutExpired:
                    proc.kill()
                    proc.wait()
                return None, started_training
    except KeyboardInterrupt:
        proc.send_signal(signal.SIGTERM)
        proc.wait()
        raise


def main():
    ap = argparse.ArgumentParser(
        "run_resilient",
        usage="run_resilient.py [opts] -- cmd ...")
    ap.add_argument("--heartbeat", required=True,
                    help="file the command appends to while progressing")
    ap.add_argument("--done", required=True,
                    help="file whose existence means success")
    ap.add_argument("--stall_sec", type=int, default=600)
    ap.add_argument("--claim_grace_sec", type=int, default=2400,
                    help="max wait for the FIRST heartbeat (device claim "
                         "after prior kills can take ~20 min)")
    ap.add_argument("--max_tries", type=int, default=8)
    ap.add_argument("--retry_pause_sec", type=int, default=45)
    ap.add_argument("--poll_sec", type=float, default=30)
    if "--" not in sys.argv:
        ap.error("separate the command with --")
    split = sys.argv.index("--")
    args = ap.parse_args(sys.argv[1:split])
    cmd = sys.argv[split + 1:]

    def log(msg):
        print(f"[run_resilient {time.strftime('%H:%M:%S')}] {msg}",
              flush=True)

    for attempt in range(1, args.max_tries + 1):
        if os.path.exists(args.done):
            log(f"done-file {args.done} exists — success")
            return 0
        log(f"attempt {attempt}/{args.max_tries}: {' '.join(cmd)}")
        rc, _ = run_once(cmd, args.heartbeat, args.stall_sec,
                         args.claim_grace_sec, log,
                         poll_sec=args.poll_sec)
        if rc == 0 and os.path.exists(args.done):
            log("success")
            return 0
        if rc not in (None, 0):
            log(f"command exited rc={rc}; retrying after pause")
        time.sleep(args.retry_pause_sec)
    log("giving up")
    return 1


if __name__ == "__main__":
    sys.exit(main())
