"""Command-line launcher — reference ``python/pathway/cli.py`` (``pathway
spawn`` / ``pathway replay`` / ``pathway spawn-from-env``).

The reference orchestrates N cooperating engine processes × T worker
threads over a port range.  On Spark the unit of parallelism inside one
machine is the executor thread pool of a single JVM, and multi-machine
orchestration belongs to the cluster manager (``spark-submit`` on
YARN/K8s) — so ``spawn -n N -t T`` here launches ONE child process whose
session runs ``local[N×T]`` (same total worker count), and exports the
reference's ``PATHWAY_*`` environment variables so user scripts that read
them keep working.  ``replay`` maps the reference's persistence replay to
Structured Streaming's checkpoint restart: pointing the child at the
recorded checkpoint directory resumes exactly-once from the stored
offsets + state snapshots.

argparse instead of click on purpose: the surface is the reference's, the
implementation is stdlib-only.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import uuid


def _plural(n: int, singular: str, plural: str) -> str:
    return f"1 {singular}" if n == 1 else f"{n} {plural}"


def _spawn_program(
    *,
    threads: int,
    processes: int,
    first_port: int,
    program: str,
    arguments: list[str],
    env_base: dict[str, str],
) -> int:
    workers = processes * threads
    print(
        f"Preparing {_plural(processes, 'process', 'processes')} "
        f"({_plural(workers, 'total worker', 'total workers')})",
        file=sys.stderr,
    )
    env = env_base.copy()
    # reference-compatible variables (cli.py:96-101) so user scripts that
    # inspect them behave identically
    env["PATHWAY_THREADS"] = str(threads)
    env["PATHWAY_PROCESSES"] = str(processes)
    env["PATHWAY_FIRST_PORT"] = str(first_port)
    env["PATHWAY_PROCESS_ID"] = "0"
    env["PATHWAY_RUN_ID"] = str(uuid.uuid4())
    # the Spark resolution of N processes × T threads: one JVM, N×T cores
    env["SPARK_GRAFT_CPUS"] = str(workers)
    cmd = [program] + arguments
    if program.endswith(".py"):
        # convenience the reference gets from `python program.py`: a bare
        # script argument runs under the current interpreter
        cmd = [sys.executable] + cmd
    handle = subprocess.Popen(cmd, env=env)
    try:
        return handle.wait()
    finally:
        handle.terminate()


def _add_spawn_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("-t", "--threads", type=int, default=1, metavar="N",
                   help="number of worker threads per process (default: 1)")
    p.add_argument("-n", "--processes", type=int, default=1, metavar="N",
                   help="number of processes (default: 1)")
    p.add_argument("--first-port", type=int, default=10000, metavar="PORT",
                   help="first port to use for communication (default: 10000)")
    p.add_argument("program", help="program (or .py script) to run")
    p.add_argument("arguments", nargs=argparse.REMAINDER,
                   help="arguments passed through to the program")


def build_parser() -> argparse.ArgumentParser:
    from pathwaydataframework_spark import __version__

    parser = argparse.ArgumentParser(
        prog="pathwaydataframework-spark",
        description="Launcher for pipelines (reference `pathway` CLI surface)",
    )
    parser.add_argument("--version", action="version", version=str(__version__))
    sub = parser.add_subparsers(dest="command", required=True)

    spawn = sub.add_parser("spawn", help="run a pipeline program")
    _add_spawn_args(spawn)
    spawn.add_argument("--record", action="store_true",
                       help="record input connector data (checkpoint the run)")
    spawn.add_argument("--record-path", default="record",
                       help="directory for the recording (default: record)")

    replay = sub.add_parser(
        "replay", help="re-run a pipeline from a recorded checkpoint"
    )
    _add_spawn_args(replay)
    replay.add_argument("--record-path", default="record",
                        help="directory the recording is stored in")
    replay.add_argument("--mode", choices=["batch", "speedrun"], default="batch",
                        help="replay pacing mode")
    replay.add_argument("--continue", dest="continue_after_replay",
                        action="store_true",
                        help="continue with live data after the replay")

    sub.add_parser(
        "spawn-from-env",
        help="run `spawn` with arguments taken from $PATHWAY_SPAWN_ARGS",
    )
    return parser


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = build_parser()
    # reference alias: `pathway spawn_from_env`
    argv = ["spawn-from-env" if a == "spawn_from_env" else a for a in argv]
    args = parser.parse_args(argv)
    env = os.environ.copy()

    if args.command == "spawn-from-env":
        spawn_args = os.environ.get("PATHWAY_SPAWN_ARGS")
        if spawn_args is None:
            print(
                "PATHWAY_SPAWN_ARGS variable is unspecified, exiting...",
                file=sys.stderr,
            )
            return 0
        return main(["spawn"] + spawn_args.split(" "))

    if args.command == "spawn":
        if args.record:
            # recording = persist the run's offsets/state; the same
            # directory is the replay source (persistence.py maps it to
            # checkpointLocation)
            env["PATHWAY_REPLAY_STORAGE"] = args.record_path
            env["PATHWAY_SNAPSHOT_ACCESS"] = "record"
            env["PATHWAY_CONTINUE_AFTER_REPLAY"] = "true"
            env["SPARK_GRAFT_CHECKPOINT_DIR"] = args.record_path
    else:  # replay
        env["PATHWAY_REPLAY_STORAGE"] = args.record_path
        env["PATHWAY_SNAPSHOT_ACCESS"] = "replay"
        env["PATHWAY_PERSISTENCE_MODE"] = args.mode
        env["PATHWAY_REPLAY_MODE"] = args.mode
        if args.continue_after_replay:
            env["PATHWAY_CONTINUE_AFTER_REPLAY"] = "true"
        # a Structured Streaming restart from the recorded checkpoint IS
        # the replay: offsets + state resume exactly-once
        env["SPARK_GRAFT_CHECKPOINT_DIR"] = args.record_path

    return _spawn_program(
        threads=args.threads,
        processes=args.processes,
        first_port=args.first_port,
        program=args.program,
        arguments=args.arguments,
        env_base=env,
    )


if __name__ == "__main__":
    sys.exit(main())
