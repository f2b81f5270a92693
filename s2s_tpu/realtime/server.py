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
        webrtc_port: Optional[int] = None,
        webrtc_rtc=None,
        webrtc_ice_servers: Optional[list[str]] = None,
    ) -> None:
        self.stop_event = stop_event
        self.pool = pool
        self.host = host
        self.port = port
        self.llm_proxy = llm_proxy
        self.started = threading.Event()
        self.bound_port: Optional[int] = None
        self._loop: Optional[asyncio.AbstractEventLoop] = None
        # WebRTC call endpoint (side HTTP listener: the websockets
        # process_request hook cannot read POST bodies)
        self.webrtc_port = webrtc_port
        self.webrtc_bound_port: Optional[int] = None
        self._webrtc_rtc = webrtc_rtc
        self._webrtc_ice_servers = webrtc_ice_servers
        self._webrtc_http = None
        self.call_manager = None

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
            if self.webrtc_bound_port is not None:
                return connection.respond(
                    http.HTTPStatus.TEMPORARY_REDIRECT,
                    f"POST SDP offers to http://{self.host}:{self.webrtc_bound_port}"
                    "/v1/realtime/calls (this port only upgrades WebSockets).\n",
                )
            return connection.respond(
                http.HTTPStatus.NOT_IMPLEMENTED,
                "WebRTC transport requires the aiortc extra; use the WebSocket "
                "transport at /v1/realtime.\n",
            )
        return connection.respond(http.HTTPStatus.NOT_FOUND, "Not found\n")

    # ── WebRTC SDP endpoint (side HTTP listener) ─────────────────────

    def _start_webrtc_endpoint(self) -> None:
        from s2s_tpu.realtime.webrtc import WEBRTC_AVAILABLE, WebRTCCallManager, load_rtc

        rtc = self._webrtc_rtc
        if rtc is None and WEBRTC_AVAILABLE:
            rtc = load_rtc()
        if rtc is None:
            return
        self.call_manager = WebRTCCallManager(
            self.pool, self.stop_event, rtc=rtc, ice_servers=self._webrtc_ice_servers
        )
        manager = self.call_manager
        loop = self._loop

        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        class CallsHandler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet
                logger.debug("webrtc-http: " + fmt, *args)

            def do_POST(self) -> None:  # noqa: N802
                from s2s_tpu.realtime.webrtc import PoolBusyError

                if self.path.split("?")[0] != "/v1/realtime/calls":
                    self.send_response(404)
                    self.end_headers()
                    return
                length = int(self.headers.get("content-length") or 0)
                body = self.rfile.read(length).decode("utf-8", errors="replace")
                if "json" in (self.headers.get("content-type") or ""):
                    try:
                        offer_sdp = json.loads(body).get("sdp", "")
                    except json.JSONDecodeError:
                        offer_sdp = ""
                else:
                    offer_sdp = body
                if not offer_sdp.strip():
                    self.send_response(400)
                    self.end_headers()
                    self.wfile.write(b"Missing SDP offer\n")
                    return
                future = asyncio.run_coroutine_threadsafe(manager.handle_call(offer_sdp), loop)
                try:
                    call_id, answer = future.result(timeout=30)
                except PoolBusyError as exc:
                    self.send_response(503)
                    self.end_headers()
                    self.wfile.write(f"{exc}\n".encode())
                    return
                except Exception as exc:  # noqa: BLE001
                    logger.exception("WebRTC negotiation failed")
                    self.send_response(500)
                    self.end_headers()
                    self.wfile.write(f"Negotiation failed: {exc}\n".encode())
                    return
                data = answer.encode()
                self.send_response(201)
                self.send_header("content-type", "application/sdp")
                self.send_header("content-length", str(len(data)))
                # hang-up handle: DELETE this location ends the call
                self.send_header("location", f"/v1/realtime/calls/{call_id}")
                self.end_headers()
                self.wfile.write(data)

            def do_DELETE(self) -> None:  # noqa: N802
                path = self.path.split("?")[0]
                prefix = "/v1/realtime/calls/"
                if not path.startswith(prefix):
                    self.send_response(404)
                    self.end_headers()
                    return
                call_id = path[len(prefix):]
                future = asyncio.run_coroutine_threadsafe(manager.hangup(call_id), loop)
                try:
                    found = future.result(timeout=10)
                except Exception:  # noqa: BLE001
                    logger.exception("WebRTC hangup failed")
                    self.send_response(500)
                    self.end_headers()
                    return
                self.send_response(200 if found else 404)
                self.end_headers()

        port = self.webrtc_port if self.webrtc_port is not None else 0
        self._webrtc_http = ThreadingHTTPServer((self.host, port), CallsHandler)
        self.webrtc_bound_port = self._webrtc_http.server_address[1]
        threading.Thread(
            target=self._webrtc_http.serve_forever, daemon=True, name="webrtc-calls-http"
        ).start()
        logger.info(
            "WebRTC call endpoint on http://%s:%d/v1/realtime/calls",
            self.host, self.webrtc_bound_port,
        )

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
            self._start_webrtc_endpoint()
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
            if self._webrtc_http is not None:
                self._webrtc_http.shutdown()
            self._loop.close()
            logger.info("Realtime server stopped")

    # handler-protocol compatibility (ThreadManager.stop sets stop_event)
    @property
    def handlers(self) -> list[Any]:
        return []
