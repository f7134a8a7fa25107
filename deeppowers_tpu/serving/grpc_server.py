"""gRPC serving front-end + client SDK.

Reference analogue: the gRPC surface (reference: src/core/api/
deeppowers.proto:6-88 — Generate(prompt, max_tokens, temperature, top_p,
stop[]) -> (text, logprobs[], tokens[]), GetMetrics, GetSchedulerStatus;
grpc_server.cpp; client_sdk.cpp with retry + exponential backoff
{3 attempts, 100ms -> 5s, x2} at client_sdk.hpp:28-33).

Implementation notes: the environment ships grpcio but no protoc Python
plugin, so the service is registered through grpc's *generic* method
handlers with JSON-serialized messages (schema below, mirroring the
reference proto). native/deeppowers.proto documents the same contract for
non-Python clients.

Methods (service "deeppowers.DeepPowers"):
  Generate        unary-unary   {prompt, max_tokens, temperature, top_p,
                                 top_k, stop[], ...} -> result JSON
  GenerateStream  unary-stream  same request -> {"text": delta} chunks,
                                 final {"done": true, ...result}
  GetMetrics          unary-unary {} -> metrics snapshot
  GetSchedulerStatus  unary-unary {} -> scheduler stats
"""

from __future__ import annotations

import json
import queue as _queue
import time
from concurrent import futures
from typing import Dict, Iterator, Optional

import grpc

from .request import Request, RequestStatus
from .scheduler import Scheduler
from .server import _gen_config_from_json, _result_json

_SERVICE = "deeppowers.DeepPowers"


def _ser(payload: Dict) -> bytes:
    return json.dumps(payload).encode()


def _de(data: bytes) -> Dict:
    return json.loads(data or b"{}")


class GRPCServer:
    def __init__(self, scheduler: Scheduler, host: str = "127.0.0.1",
                 port: int = 0, *, max_workers: int = 16,
                 max_message_mb: int = 64):
        self.scheduler = scheduler
        self._server = grpc.server(
            futures.ThreadPoolExecutor(max_workers=max_workers),
            options=[("grpc.max_receive_message_length",
                      max_message_mb * 1024 * 1024),
                     ("grpc.max_send_message_length",
                      max_message_mb * 1024 * 1024)])
        handlers = {
            "Generate": grpc.unary_unary_rpc_method_handler(
                self._generate,
                request_deserializer=_de, response_serializer=_ser),
            "GenerateStream": grpc.unary_stream_rpc_method_handler(
                self._generate_stream,
                request_deserializer=_de, response_serializer=_ser),
            "GetMetrics": grpc.unary_unary_rpc_method_handler(
                self._get_metrics,
                request_deserializer=_de, response_serializer=_ser),
            "GetSchedulerStatus": grpc.unary_unary_rpc_method_handler(
                self._get_status,
                request_deserializer=_de, response_serializer=_ser),
        }
        self._server.add_generic_rpc_handlers(
            (grpc.method_handlers_generic_handler(_SERVICE, handlers),))
        self.port = self._server.add_insecure_port(f"{host}:{port}")
        self.host = host

    def start(self) -> None:
        self._server.start()

    def stop(self, grace: float = 2.0) -> None:
        self._server.stop(grace)

    # -- handlers -----------------------------------------------------------
    def _make_request(self, body: Dict, context) -> Optional[Request]:
        prompt = body.get("prompt")
        if not isinstance(prompt, str) or not prompt:
            context.abort(grpc.StatusCode.INVALID_ARGUMENT,
                          "'prompt' (non-empty string) required")
            return None
        cfg = _gen_config_from_json(body)
        try:
            cfg.validate()
        except ValueError as e:
            context.abort(grpc.StatusCode.INVALID_ARGUMENT, str(e))
            return None
        return Request(prompt=prompt, config=cfg)

    def _generate(self, body: Dict, context) -> Dict:
        req = self._make_request(body, context)
        req = self.scheduler.submit_sync(req)
        if req.status == RequestStatus.FAILED:
            context.abort(grpc.StatusCode.RESOURCE_EXHAUSTED,
                          req.result.error or "failed")
        return _result_json(req)

    def _generate_stream(self, body: Dict, context) -> Iterator[Dict]:
        req = self._make_request(body, context)
        chunks: "_queue.Queue" = _queue.Queue()

        def cb(delta: str) -> bool:
            chunks.put(delta)
            return context.is_active()

        req.stream_callback = cb
        self.scheduler.submit(req)
        while True:
            try:
                delta = chunks.get(timeout=0.05)
                yield {"text": delta}
            except _queue.Empty:
                if req.wait(0):
                    break
        while not chunks.empty():
            yield {"text": chunks.get()}
        yield {"done": True, **_result_json(req)}

    def _get_metrics(self, body: Dict, context) -> Dict:
        return self.scheduler.monitor.snapshot()

    def _get_status(self, body: Dict, context) -> Dict:
        return self.scheduler.stats()


class GRPCClient:
    """Client SDK with retry + exponential backoff (reference:
    client_sdk.hpp:28-33 — 3 attempts, 100ms initial, x2 factor, 5s cap)."""

    def __init__(self, target: str, *, max_retries: int = 3,
                 initial_backoff_s: float = 0.1, max_backoff_s: float = 5.0,
                 backoff_multiplier: float = 2.0, timeout_s: float = 600.0):
        self._channel = grpc.insecure_channel(target)
        self.max_retries = max_retries
        self.initial_backoff_s = initial_backoff_s
        self.max_backoff_s = max_backoff_s
        self.backoff_multiplier = backoff_multiplier
        self.timeout_s = timeout_s
        self.stats = {"requests": 0, "retries": 0, "failures": 0}

    def close(self) -> None:
        self._channel.close()

    def _unary(self, method: str):
        return self._channel.unary_unary(
            f"/{_SERVICE}/{method}",
            request_serializer=_ser, response_deserializer=_de)

    def _call_with_retry(self, fn, payload: Dict) -> Dict:
        self.stats["requests"] += 1
        backoff = self.initial_backoff_s
        last = None
        for attempt in range(self.max_retries):
            try:
                return fn(payload, timeout=self.timeout_s)
            except grpc.RpcError as e:
                last = e
                if e.code() in (grpc.StatusCode.INVALID_ARGUMENT,
                                grpc.StatusCode.PERMISSION_DENIED):
                    break  # not retryable
                self.stats["retries"] += 1
                time.sleep(backoff)
                backoff = min(backoff * self.backoff_multiplier,
                              self.max_backoff_s)
        self.stats["failures"] += 1
        raise last

    def generate(self, prompt: str, **params) -> Dict:
        return self._call_with_retry(self._unary("Generate"),
                                     {"prompt": prompt, **params})

    def generate_stream(self, prompt: str, **params) -> Iterator[Dict]:
        stream = self._channel.unary_stream(
            f"/{_SERVICE}/GenerateStream",
            request_serializer=_ser, response_deserializer=_de)
        yield from stream({"prompt": prompt, **params},
                          timeout=self.timeout_s)

    def generate_async(self, prompt: str, **params):
        """Future-based async call (reference: generate_async,
        client_sdk.hpp:28)."""
        call = self._unary("Generate").future(
            {"prompt": prompt, **params}, timeout=self.timeout_s)
        return call

    def get_metrics(self) -> Dict:
        return self._call_with_retry(self._unary("GetMetrics"), {})

    def get_scheduler_status(self) -> Dict:
        return self._call_with_retry(self._unary("GetSchedulerStatus"), {})
