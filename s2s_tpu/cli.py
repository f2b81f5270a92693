"""Console entry point: ``s2s-tpu {serve,talk,local}`` (reference ``cli.py``)."""

from __future__ import annotations

import logging
import signal
import sys
import threading

logger = logging.getLogger(__name__)

COMMANDS = ("serve", "talk", "local")


def _setup_logging(level: str) -> None:
    logging.basicConfig(
        level=getattr(logging, level.upper(), logging.INFO),
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )


def run_serve(argv: list[str]) -> None:
    from s2s_tpu.arguments import parse_arguments
    from s2s_tpu.builder import build_pipeline

    args = parse_arguments(argv)
    _setup_logging(args.module.log_level)
    stop_event = threading.Event()
    manager, server = build_pipeline(args, stop_event)

    def handle_signal(signum, frame):
        logger.info("Signal %s received; shutting down", signum)
        stop_event.set()

    signal.signal(signal.SIGINT, handle_signal)
    signal.signal(signal.SIGTERM, handle_signal)

    manager.start()
    try:
        while not stop_event.is_set():
            stop_event.wait(0.5)
    finally:
        manager.stop()


def run_talk(argv: list[str]) -> None:
    import argparse
    from dataclasses import fields

    from s2s_tpu.arguments import ClientArgs
    from s2s_tpu.client import run_realtime_audio_client

    parser = argparse.ArgumentParser(prog="s2s-tpu talk")
    for f in fields(ClientArgs):
        typ = {int: int, float: float}.get(f.type if isinstance(f.type, type) else str, str)
        parser.add_argument(f"--{f.name}", type=typ, default=f.default)
    ns = parser.parse_args(argv)
    _setup_logging("info")
    run_realtime_audio_client(ns)


def run_local(argv: list[str]) -> None:
    """Server + loopback client in one process."""
    import time

    from s2s_tpu.arguments import parse_arguments
    from s2s_tpu.builder import build_pipeline
    from s2s_tpu.client import run_realtime_audio_client

    split = argv.index("--") if "--" in argv else len(argv)
    server_argv, client_argv = argv[:split], argv[split + 1 :]
    args = parse_arguments(server_argv)
    args.server.port = args.server.port or 0
    _setup_logging(args.module.log_level)
    stop_event = threading.Event()
    manager, server = build_pipeline(args, stop_event)
    manager.start()
    try:
        if not server.started.wait(30):
            raise SystemExit("server failed to start")
        run_talk(
            ["--url", f"ws://{args.server.host}:{server.bound_port}/v1/realtime", *client_argv]
        )
        time.sleep(0.2)
    finally:
        stop_event.set()
        manager.stop()


def main() -> None:
    argv = sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        print(f"usage: s2s-tpu {{{','.join(COMMANDS)}}} [options]\n")
        print("  serve  run the realtime voice-agent server")
        print("  talk   connect an audio client to a running server")
        print("  local  server + loopback client in one process")
        return
    command, rest = argv[0], argv[1:]
    if command not in COMMANDS:
        # bare options default to serve (reference behavior)
        command, rest = "serve", argv
    {"serve": run_serve, "talk": run_talk, "local": run_local}[command](rest)


if __name__ == "__main__":
    main()
