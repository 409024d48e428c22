"""Unit tests for scripts/run_resilient.py's stall detector.

The subtle logic (VERDICT r4 weak #6): a freshly launched TPU process
waiting on the device claim has a stale-or-missing heartbeat and must
NOT be killed (claims take 30 s - 20 min after prior kills); a stall is
only declared once the heartbeat mtime has ADVANCED past this attempt's
launch (training really started) and then goes stale. The naive
mtime-staleness version killed claim-waiters and re-wedged the queue.

Fake children (sys.executable -c ...) exercise each path without TPU.
"""

import importlib.util
import os
import subprocess
import sys
import time

import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "run_resilient.py")
spec = importlib.util.spec_from_file_location("run_resilient", SCRIPT)
rr = importlib.util.module_from_spec(spec)
spec.loader.exec_module(rr)


def logs():
    out = []
    return out, lambda msg: out.append(msg)


def child(code):
    return [sys.executable, "-u", "-c", code]


class TestRunOnce:
    def test_clean_exit_passes_through(self, tmp_path):
        hb = str(tmp_path / "hb")
        msgs, log = logs()
        rc, started = rr.run_once(child("pass"), hb, stall_sec=5,
                                  claim_grace_sec=30, log=log, poll_sec=0.2)
        assert rc == 0 and started is False

    def test_heartbeat_then_stall_kills(self, tmp_path):
        """Heartbeat advances (training started), then goes stale →
        the child must be killed and the stall reported (rc None)."""
        hb = str(tmp_path / "hb")
        code = (
            "import time,sys\n"
            f"open({hb!r},'a').write('x')\n"
            "time.sleep(600)\n"
        )
        msgs, log = logs()
        t0 = time.time()
        rc, started = rr.run_once(child(code), hb, stall_sec=2,
                                  claim_grace_sec=60, log=log, poll_sec=0.2)
        assert rc is None
        assert started is True, "heartbeat advance was not registered"
        assert time.time() - t0 < 60, "stall not detected promptly"
        assert any("stall" in m for m in msgs)

    def test_claim_waiter_not_killed_within_grace(self, tmp_path):
        """No heartbeat yet (device claim in progress): the child must
        SURVIVE well past stall_sec — only claim_grace_sec applies."""
        hb = str(tmp_path / "hb")
        # child writes its heartbeat only after 4s (> stall_sec), then
        # exits 0: a claim that eventually granted.
        code = (
            "import time\n"
            "time.sleep(4)\n"
            f"open({hb!r},'a').write('x')\n"
        )
        msgs, log = logs()
        rc, started = rr.run_once(child(code), hb, stall_sec=1,
                                  claim_grace_sec=60, log=log, poll_sec=0.2)
        assert rc == 0, "claim-waiter was killed before grace expired"

    def test_no_heartbeat_ever_gives_up_after_grace(self, tmp_path):
        hb = str(tmp_path / "hb")
        msgs, log = logs()
        t0 = time.time()
        rc, started = rr.run_once(child("import time; time.sleep(600)"),
                                  hb, stall_sec=1, claim_grace_sec=2,
                                  log=log, poll_sec=0.2)
        assert rc is None and started is False
        assert time.time() - t0 < 60
        assert any("no heartbeat" in m for m in msgs)

    def test_preexisting_stale_heartbeat_is_not_a_start(self, tmp_path):
        """A heartbeat file left over from a PREVIOUS attempt (mtime <
        this attempt's start) must not count as 'training started' —
        the child is a claim-waiter and must survive stall_sec."""
        hb = tmp_path / "hb"
        hb.write_text("old")
        os.utime(hb, (time.time() - 3600, time.time() - 3600))
        msgs, log = logs()
        code = "import time; time.sleep(3)"
        rc, started = rr.run_once(child(code), str(hb), stall_sec=1,
                                  claim_grace_sec=60, log=log, poll_sec=0.2)
        assert rc == 0 and started is False, \
            "stale pre-existing heartbeat was treated as a live start"


class TestMainLoop:
    def run_main(self, tmp_path, extra, cmd_code, tries=3):
        hb = str(tmp_path / "hb")
        done = str(tmp_path / "done")
        argv = ["run_resilient.py", "--heartbeat", hb, "--done", done,
                "--retry_pause_sec", "0", "--max_tries", str(tries),
                "--poll_sec", "0.2", *extra, "--", *child(cmd_code)]
        old = sys.argv
        sys.argv = argv
        try:
            return rr.main(), hb, done
        finally:
            sys.argv = old

    def test_done_file_short_circuits(self, tmp_path):
        (tmp_path / "done").write_text("{}")
        rc, _, _ = self.run_main(tmp_path, [], "raise SystemExit(1)")
        assert rc == 0

    def test_success_writes_done(self, tmp_path):
        hb = str(tmp_path / "hb")
        done = str(tmp_path / "done")
        code = (f"open({hb!r},'a').write('x')\n"
                f"open({done!r},'w').write('{{}}')\n")
        rc, _, _ = self.run_main(tmp_path, [], code)
        assert rc == 0

    def test_stall_then_resume_relaunches_to_success(self, tmp_path):
        """First attempt heartbeats then hangs (killed); the relaunch
        completes — the checkpoint-resume path."""
        hb = str(tmp_path / "hb")
        done = str(tmp_path / "done")
        flag = str(tmp_path / "attempted_once")
        code = (
            "import os, time\n"
            f"open({hb!r},'a').write('x')\n"
            f"if os.path.exists({flag!r}):\n"
            f"    open({done!r},'w').write('{{}}')\n"
            "else:\n"
            f"    open({flag!r},'w').write('1')\n"
            "    time.sleep(600)\n"
        )
        rc, _, _ = self.run_main(
            tmp_path, ["--stall_sec", "2", "--claim_grace_sec", "60"],
            code)
        assert rc == 0
        assert os.path.exists(done)

    def test_gives_up_after_max_tries(self, tmp_path):
        rc, _, _ = self.run_main(tmp_path, [], "raise SystemExit(3)",
                                 tries=2)
        assert rc == 1
