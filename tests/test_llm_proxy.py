"""LLM-proxy behavior matrix (reference ``tests/openai_realtime/test_llm_proxy.py``).

Drives the real ``LLMProxy`` HTTP server against a scripted fake upstream:
passthrough fidelity, forced model / store=false, auth-key handling,
path-shape 501 contract, SSE streaming verbatim + token accounting, and the
per-status usage buckets surfaced through ``usage_payload``.
"""

from __future__ import annotations

import gzip
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import httpx
import pytest

from s2s_tpu.realtime.llm_proxy import LLMProxy, ProxyUsage
from s2s_tpu.realtime.router import usage_payload


class FakeUpstream:
    """Programmable OpenAI-shaped upstream.

    ``responder`` is a callable ``(path, body, headers) -> response`` where
    response is ``(status, json_dict)`` for plain JSON or
    ``("sse", [line, ...])`` for an event stream.  Every request is recorded.
    """

    def __init__(self):
        self.requests: list[dict] = []
        self.responder = lambda path, body, headers: (200, {"ok": True})
        fake = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):
                pass

            def do_POST(self):  # noqa: N802
                length = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(length) or b"{}")
                fake.requests.append(
                    {"path": self.path, "body": body, "headers": dict(self.headers)}
                )
                result = fake.responder(self.path, body, dict(self.headers))
                if result[0] == "sse":
                    self.send_response(200)
                    self.send_header("Content-Type", "text/event-stream")
                    self.end_headers()
                    for line in result[1]:
                        self.wfile.write(line if isinstance(line, bytes) else line.encode())
                        self.wfile.flush()
                elif result[0] == "gzip-sse":
                    payload = gzip.compress(b"".join(
                        line if isinstance(line, bytes) else line.encode()
                        for line in result[1]
                    ))
                    self.send_response(200)
                    self.send_header("Content-Type", "text/event-stream")
                    self.send_header("Content-Encoding", "gzip")
                    self.send_header("Content-Length", str(len(payload)))
                    self.end_headers()
                    self.wfile.write(payload)
                else:
                    status, payload = result
                    raw = json.dumps(payload).encode()
                    self.send_response(status)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(raw)))
                    self.end_headers()
                    self.wfile.write(raw)

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self._server.server_address[1]
        threading.Thread(target=self._server.serve_forever, daemon=True).start()

    @property
    def base_url(self) -> str:
        return f"http://127.0.0.1:{self.port}/v1"

    def stop(self):
        self._server.shutdown()

    @property
    def last(self) -> dict:
        return self.requests[-1]


@pytest.fixture()
def upstream():
    fake = FakeUpstream()
    yield fake
    fake.stop()


def _start_proxy(upstream, shape="chat", api_key="server-key", model="forced-model"):
    proxy = LLMProxy(upstream.base_url, api_key, model, shape=shape, port=0)
    port = proxy.start("127.0.0.1", 0)
    return proxy, f"http://127.0.0.1:{port}"


def _post(url, path, body, headers=None):
    return httpx.post(url + path, json=body, headers=headers or {}, timeout=10.0)


CHAT = "/v1/chat/completions"
RESP = "/v1/responses"


class TestChatPassthrough:
    def test_upstream_response_arrives_verbatim(self, upstream):
        upstream.responder = lambda p, b, h: (200, {"id": "cmpl-1", "choices": [{"message": {"content": "hi"}}]})
        proxy, url = _start_proxy(upstream)
        try:
            r = _post(url, CHAT, {"messages": [], "model": "client-model"})
            assert r.status_code == 200
            assert r.json()["id"] == "cmpl-1"
        finally:
            proxy.stop()

    def test_upstream_receives_forced_model_and_server_key(self, upstream):
        proxy, url = _start_proxy(upstream)
        try:
            _post(url, CHAT, {"messages": [], "model": "client-model"},
                  headers={"Authorization": "Bearer client-key"})
            sent = upstream.last
            assert sent["body"]["model"] == "forced-model"
            assert sent["headers"]["Authorization"] == "Bearer server-key"
        finally:
            proxy.stop()

    def test_client_bearer_is_never_forwarded_without_server_key(self, upstream):
        proxy, url = _start_proxy(upstream, api_key=None)
        try:
            _post(url, CHAT, {"messages": []}, headers={"Authorization": "Bearer client-key"})
            assert "Authorization" not in upstream.last["headers"]
        finally:
            proxy.stop()

    @pytest.mark.parametrize("raw", [b"[1, 2]", b'"text"', b"42", b"not json"])
    def test_non_object_bodies_are_400_and_never_reach_upstream(self, upstream, raw):
        proxy, url = _start_proxy(upstream)
        try:
            r = httpx.post(url + CHAT, content=raw,
                           headers={"Content-Type": "application/json"}, timeout=10.0)
            assert r.status_code == 400
            assert upstream.requests == []
        finally:
            proxy.stop()

    def test_error_status_passes_through(self, upstream):
        upstream.responder = lambda p, b, h: (429, {"error": {"message": "quota", "type": "rate_limit"}})
        proxy, url = _start_proxy(upstream)
        try:
            r = _post(url, CHAT, {"messages": []})
            assert r.status_code == 429
            assert r.json()["error"]["type"] == "rate_limit"
            assert proxy.usage.responses_429 == 1
        finally:
            proxy.stop()


class TestPathShapeContract:
    def test_responses_path_is_501_under_chat_backend(self, upstream):
        proxy, url = _start_proxy(upstream, shape="chat")
        try:
            r = _post(url, RESP, {"input": "x"})
            assert r.status_code == 501
            assert "chat" in r.json()["error"]
            assert upstream.requests == []
        finally:
            proxy.stop()

    def test_chat_path_is_501_under_responses_backend(self, upstream):
        proxy, url = _start_proxy(upstream, shape="responses")
        try:
            r = _post(url, CHAT, {"messages": []})
            assert r.status_code == 501
            assert "/v1/responses" in r.json()["error"]
        finally:
            proxy.stop()

    def test_unknown_path_is_501(self, upstream):
        proxy, url = _start_proxy(upstream)
        try:
            assert _post(url, "/v1/embeddings", {}).status_code == 501
        finally:
            proxy.stop()


class TestResponsesPassthrough:
    def test_store_false_and_forced_model(self, upstream):
        proxy, url = _start_proxy(upstream, shape="responses")
        try:
            _post(url, RESP, {"input": "hello", "model": "client-model", "store": True})
            sent = upstream.last["body"]
            assert sent["store"] is False
            assert sent["model"] == "forced-model"
        finally:
            proxy.stop()

    def test_non_streaming_tokens_come_from_body(self, upstream):
        upstream.responder = lambda p, b, h: (
            200,
            {"id": "resp-1", "usage": {"input_tokens": 21, "output_tokens": 8}},
        )
        proxy, url = _start_proxy(upstream, shape="responses")
        try:
            _post(url, RESP, {"input": "x"})
            assert proxy.usage.input_tokens == 21
            assert proxy.usage.output_tokens == 8
        finally:
            proxy.stop()


def _sse(lines):
    return ["data: " + json.dumps(obj) + "\n\n" if not isinstance(obj, str) else obj
            for obj in lines]


class TestStreaming:
    def test_streamed_bytes_arrive_verbatim_in_order(self, upstream):
        chunks = [
            {"id": "c", "choices": [{"delta": {"content": "Hel"}}]},
            {"id": "c", "choices": [{"delta": {"content": "lo"}}]},
        ]
        upstream.responder = lambda p, b, h: ("sse", _sse(chunks) + ["data: [DONE]\n\n"])
        proxy, url = _start_proxy(upstream)
        try:
            with httpx.stream("POST", url + CHAT, json={"messages": [], "stream": True},
                              timeout=10.0) as r:
                body = b"".join(r.iter_raw())
            texts = [json.loads(line[5:]) for line in body.decode().splitlines()
                     if line.startswith("data:") and "[DONE]" not in line]
            assert [t["choices"][0]["delta"]["content"] for t in texts] == ["Hel", "lo"]
            assert b"[DONE]" in body
        finally:
            proxy.stop()

    def test_include_usage_is_injected_and_tokens_counted(self, upstream):
        final = {"id": "c", "choices": [],
                 "usage": {"prompt_tokens": 11, "completion_tokens": 5}}
        upstream.responder = lambda p, b, h: ("sse", _sse([final]) + ["data: [DONE]\n\n"])
        proxy, url = _start_proxy(upstream)
        try:
            with httpx.stream("POST", url + CHAT, json={"messages": [], "stream": True},
                              timeout=10.0) as r:
                b"".join(r.iter_raw())
            assert upstream.last["body"]["stream_options"]["include_usage"] is True
            assert proxy.usage.input_tokens == 11
            assert proxy.usage.output_tokens == 5
            assert proxy.usage.streamed_requests == 1
        finally:
            proxy.stop()

    def test_responses_stream_tokens_come_from_completed_event(self, upstream):
        events = [
            {"type": "response.output_text.delta", "delta": "hi"},
            {"type": "response.completed",
             "response": {"usage": {"input_tokens": 9, "output_tokens": 4}}},
        ]
        upstream.responder = lambda p, b, h: ("sse", _sse(events))
        proxy, url = _start_proxy(upstream, shape="responses")
        try:
            with httpx.stream("POST", url + RESP, json={"input": "x", "stream": True},
                              timeout=10.0) as r:
                body = b"".join(r.iter_raw())
            # no include_usage mutation on the responses path
            assert "stream_options" not in upstream.last["body"]
            assert proxy.usage.input_tokens == 9
            assert proxy.usage.output_tokens == 4
            assert b"response.completed" in body
        finally:
            proxy.stop()

    def test_crlf_delimited_sse_is_counted(self, upstream):
        final = json.dumps({"usage": {"prompt_tokens": 6, "completion_tokens": 2}})
        upstream.responder = lambda p, b, h: ("sse", [f"data: {final}\r\n\r\ndata: [DONE]\r\n\r\n"])
        proxy, url = _start_proxy(upstream)
        try:
            with httpx.stream("POST", url + CHAT, json={"messages": [], "stream": True},
                              timeout=10.0) as r:
                b"".join(r.iter_raw())
            assert proxy.usage.input_tokens == 6
            assert proxy.usage.output_tokens == 2
        finally:
            proxy.stop()

    def test_gzip_compressed_upstream_stream_is_decoded(self, upstream):
        final = {"usage": {"prompt_tokens": 11, "completion_tokens": 5}}
        upstream.responder = lambda p, b, h: ("gzip-sse", _sse([final]) + ["data: [DONE]\n\n"])
        proxy, url = _start_proxy(upstream)
        try:
            with httpx.stream("POST", url + CHAT, json={"messages": [], "stream": True},
                              timeout=10.0) as r:
                body = b"".join(r.iter_raw())
            assert b"prompt_tokens" in body  # decoded, not gzip bytes
            assert proxy.usage.input_tokens == 11
        finally:
            proxy.stop()


class TestFailuresAndCounters:
    def test_unreachable_upstream_is_502(self):
        proxy = LLMProxy("http://127.0.0.1:1/v1", None, "m", port=0)
        port = proxy.start("127.0.0.1", 0)
        try:
            r = httpx.post(f"http://127.0.0.1:{port}{CHAT}", json={"messages": []}, timeout=30.0)
            assert r.status_code == 502
            assert proxy.usage.upstream_errors == 1
            assert proxy.usage.responses_5xx == 1
        finally:
            proxy.stop()

    def test_counters_after_mixed_traffic(self, upstream):
        script = [
            (200, {"ok": 1, "usage": {"prompt_tokens": 7, "completion_tokens": 3}}),
            (200, {"ok": 2, "usage": {"prompt_tokens": 7, "completion_tokens": 3}}),
            (500, {"error": {"message": "boom", "type": "server_error"}}),
            (429, {"error": {"message": "quota", "type": "rate_limit"}}),
            (404, {"error": {"message": "gone", "type": "not_found"}}),
        ]
        it = iter(script)
        upstream.responder = lambda p, b, h: next(it)
        proxy, url = _start_proxy(upstream)
        try:
            for _ in script:
                _post(url, CHAT, {"messages": []})
            u = proxy.usage
            assert u.requests == 5
            assert u.responses_2xx == 2
            assert u.responses_5xx == 1
            assert u.responses_429 == 1
            assert u.responses_4xx == 1
            assert u.input_tokens == 14
            assert u.output_tokens == 6
        finally:
            proxy.stop()

    def test_usage_payload_carries_llm_proxy_section(self):
        usage = ProxyUsage(requests=3, responses_2xx=2, responses_429=1,
                           input_tokens=10, output_tokens=4)
        payload = usage_payload([], llm_proxy_usage=usage)
        assert payload["llm_proxy"]["requests"] == 3
        assert payload["llm_proxy"]["responses_429"] == 1
