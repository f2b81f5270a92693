"""Realtime server: websockets-based WS route + HTTP endpoints, runs in a
ThreadManager thread (reference ``api/openai_realtime/server.py`` +
``websocket_router.py:create_app``)."""

from __future__ import annotations

import asyncio
import http
import json
import logging
import threading
from typing import Any, Optional

from s2s_tpu.realtime.pipeline_unit import PipelineUnit
from s2s_tpu.realtime.router import (
    claim_unit,
    pool_payload,
    send_loop_for,
    usage_payload,
    ws_session,
)
from s2s_tpu.realtime.service import build_error_event
from s2s_tpu.realtime.transports import WebSocketTransport, send_ws_event

logger = logging.getLogger(__name__)


class RealtimeServer:
    """Owns the asyncio loop: WS route ``/v1/realtime``, HTTP ``/v1/usage``
    and ``/v1/pool``, one send-loop task per pool unit.

    Run via ``run()`` inside a ThreadManager thread; ``stop_event`` shuts the
    loop down.  Appended to the handler list as the final "handler".
    """

    def __init__(
        self,
        stop_event: threading.Event,
        pool: list[PipelineUnit],
        host: str = "127.0.0.1",
        port: int = 8123,
        llm_proxy=None,
    ) -> None:
        self.stop_event = stop_event
        self.pool = pool
        self.host = host
        self.port = port
        self.llm_proxy = llm_proxy
        self.started = threading.Event()
        self.bound_port: Optional[int] = None
        self._loop: Optional[asyncio.AbstractEventLoop] = None

    # ── HTTP endpoints over the websockets process_request hook ──────

    def _process_request(self, connection, request):
        path = request.path.split("?")[0]
        if path == "/v1/realtime":
            return None  # continue the WS handshake
        if self.llm_proxy is not None:
            handled = self.llm_proxy.maybe_handle(connection, request)
            if handled is not None:
                return handled
        if path == "/v1/usage":
            body = json.dumps(usage_payload(self.pool, getattr(self.llm_proxy, "usage", None)))
            return connection.respond(http.HTTPStatus.OK, body + "\n")
        if path == "/v1/pool":
            return connection.respond(http.HTTPStatus.OK, json.dumps(pool_payload(self.pool)) + "\n")
        if path == "/v1/realtime/calls":
            from s2s_tpu.realtime.webrtc import WEBRTC_AVAILABLE

            if not WEBRTC_AVAILABLE:
                return connection.respond(
                    http.HTTPStatus.NOT_IMPLEMENTED,
                    "WebRTC transport requires the aiortc extra; use the WebSocket "
                    "transport at /v1/realtime.\n",
                )
            return connection.respond(
                http.HTTPStatus.NOT_IMPLEMENTED, "WebRTC SDP negotiation not wired in this build\n"
            )
        return connection.respond(http.HTTPStatus.NOT_FOUND, "Not found\n")

    async def _ws_handler(self, ws) -> None:
        transport = WebSocketTransport(ws)
        unit = claim_unit(self.pool, transport)
        if unit is None:
            logger.warning("Rejected connection: all %d pipeline slots in use", len(self.pool))
            await send_ws_event(
                ws,
                build_error_event(
                    f"All {len(self.pool)} session slots are in use. "
                    "Disconnect an existing client first.",
                    "session_limit_reached",
                ),
            )
            await ws.close(code=1008, reason="All session slots are in use")
            return
        await ws_session(ws, unit, self.stop_event)

    async def _main(self) -> None:
        import websockets.asyncio.server as ws_server

        send_tasks = [asyncio.create_task(send_loop_for(unit, self.stop_event)) for unit in self.pool]
        async with ws_server.serve(
            self._ws_handler, self.host, self.port, process_request=self._process_request
        ) as server:
            self.bound_port = server.sockets[0].getsockname()[1] if server.sockets else self.port
            if self.llm_proxy is not None:
                self.llm_proxy.start(self.host, self.bound_port)
            self.started.set()
            logger.info("Realtime server on ws://%s:%d/v1/realtime", self.host, self.bound_port)
            while not self.stop_event.is_set():
                await asyncio.sleep(0.1)
        from s2s_tpu.realtime.router import _release_tasks

        for task in (*send_tasks, *_release_tasks):
            task.cancel()
        for task in (*send_tasks, *list(_release_tasks)):
            try:
                await task
            except asyncio.CancelledError:
                pass
        for unit in self.pool:
            sess = unit.session
            if sess is not None and sess.transport is not None:
                try:
                    await sess.transport.close()
                except Exception:  # noqa: BLE001
                    pass

    def run(self) -> None:
        """ThreadManager entry point."""
        self._loop = asyncio.new_event_loop()
        asyncio.set_event_loop(self._loop)
        try:
            self._loop.run_until_complete(self._main())
        finally:
            self._loop.close()
            logger.info("Realtime server stopped")

    # handler-protocol compatibility (ThreadManager.stop sets stop_event)
    @property
    def handlers(self) -> list[Any]:
        return []
