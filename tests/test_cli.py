"""CLI launcher tests — reference ``pathway spawn`` surface (cli.py)."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from pathwaydataframework_spark.cli import build_parser, main


def test_spawn_runs_pipeline_script(tmp_path):
    # `python -m pathwaydataframework_spark spawn -t 2 -n 2 script.py` must
    # run the script with the reference PATHWAY_* env and a worker count of
    # threads × processes folded into the single Spark session
    out_file = tmp_path / "out.txt"
    script = tmp_path / "pipe.py"
    script.write_text(
        "import os\n"
        "import pathwaydataframework_spark as pw\n"
        "spark = pw.get_spark(app_name='cli-test')\n"
        "t = pw.Table.from_rows(spark, [(1,), (2,), (3,)], 'x long')\n"
        "n = t.df.count()\n"
        "with open(r'%s', 'w') as f:\n"
        "    f.write(f\"{n},{os.environ['PATHWAY_THREADS']},\"\n"
        "            f\"{os.environ['PATHWAY_PROCESSES']},\"\n"
        "            f\"{os.environ['SPARK_GRAFT_CPUS']},\"\n"
        "            f\"{os.environ['PATHWAY_PROCESS_ID']}\")\n"
        "spark.stop()\n" % out_file
    )
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "pathwaydataframework_spark",
            "spawn",
            "-t",
            "2",
            "-n",
            "2",
            str(script),
        ],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        # the package is run from the repo, not installed — the spawned
        # grandchild (the script) needs it importable too
        env={
            **os.environ,
            "PYTHONPATH": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        },
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "Preparing 2 processes (4 total workers)" in proc.stderr
    assert out_file.read_text() == "3,2,2,4,0"


def test_spawn_forwards_arguments_and_exit_code(tmp_path):
    script = tmp_path / "args.py"
    script.write_text(
        "import sys\n"
        "assert sys.argv[1:] == ['--alpha', 'beta'], sys.argv\n"
        "sys.exit(7)\n"
    )
    rc = main(["spawn", str(script), "--alpha", "beta"])
    assert rc == 7


def test_replay_sets_reference_env(tmp_path, monkeypatch):
    seen = {}

    def fake_popen(cmd, env=None):
        seen["cmd"] = cmd
        seen["env"] = env

        class H:
            def wait(self):
                return 0

            def terminate(self):
                pass

        return H()

    import pathwaydataframework_spark.cli as cli

    monkeypatch.setattr(cli.subprocess, "Popen", fake_popen)
    rc = main(
        ["replay", "--record-path", str(tmp_path / "rec"), "--mode", "speedrun",
         "--continue", "prog.py"]
    )
    assert rc == 0
    env = seen["env"]
    assert env["PATHWAY_SNAPSHOT_ACCESS"] == "replay"
    assert env["PATHWAY_REPLAY_MODE"] == "speedrun"
    assert env["PATHWAY_CONTINUE_AFTER_REPLAY"] == "true"
    assert env["SPARK_GRAFT_CHECKPOINT_DIR"] == str(tmp_path / "rec")
    assert seen["cmd"][0] == sys.executable and seen["cmd"][1] == "prog.py"


def test_spawn_from_env(monkeypatch, tmp_path):
    script = tmp_path / "noop.py"
    script.write_text("pass\n")
    monkeypatch.setenv("PATHWAY_SPAWN_ARGS", f"-t 3 {script}")
    assert main(["spawn-from-env"]) == 0
    # the reference's underscore alias works too
    assert main(["spawn_from_env"]) == 0
    monkeypatch.delenv("PATHWAY_SPAWN_ARGS")
    assert main(["spawn-from-env"]) == 0  # warns and exits cleanly


def test_parser_surface():
    p = build_parser()
    args = p.parse_args(["spawn", "-t", "4", "-n", "2", "--record", "x.py", "a"])
    assert args.threads == 4 and args.processes == 2 and args.record
    assert args.program == "x.py" and args.arguments == ["a"]
    with pytest.raises(SystemExit):
        p.parse_args(["bogus"])
