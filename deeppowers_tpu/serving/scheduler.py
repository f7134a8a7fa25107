"""Continuous-batching scheduler: the serving brain.

Replaces the reference's Scheduler + BatchingEngine + ExecutionEngine trio
(reference: src/core/scheduling/scheduler.cpp — admission control :66-88,
batch formation :418-472, worker/monitor threads :305-376, AIMD batch resize
:474-490; src/core/batching/batching_engine.cpp:92-149 — worker threads
forming padded batches, the actual compute a TODO at :185) with one loop and
token-level continuous batching:

- requests join the running decode batch the moment a slot frees (no
  batch-boundary barrier, no padding-ratio rejection — slots make padding a
  non-issue),
- one thread drives the jitted decode step; admission happens between steps,
- per-request streaming callbacks with incremental detokenization and stop-
  string scanning,
- admission control: queue capacity + max active (reference semantics).
"""

from __future__ import annotations

import threading
import time
import traceback
from typing import Callable, Dict, List, Optional

from ..config import SchedulerConfig
from ..runtime.engine import InferenceEngine, NoFreePages, SlotResult
from .metrics import Monitor
from .queue import QueueFullError, RequestQueue
from .request import Request, RequestStatus


class Scheduler:
    def __init__(
        self,
        engine: InferenceEngine,
        *,
        encode: Callable[[str], List[int]],
        decode: Callable[[List[int]], str],
        config: Optional[SchedulerConfig] = None,
        monitor: Optional[Monitor] = None,
    ):
        self.engine = engine
        self.encode = encode
        self.decode = decode
        self.config = config or SchedulerConfig()
        self.monitor = monitor or Monitor()
        self.queue = RequestQueue(self.config.max_queue_size)
        self._by_slot: Dict[int, Request] = {}
        self._emitted_text: Dict[int, str] = {}
        self._held: Dict[int, bool] = {}
        self._running = False
        self._thread: Optional[threading.Thread] = None
        self._wake = threading.Event()
        self._hold_t0 = None
        self._pending_cancels: List = []
        self.dropped_requests = 0

    # -- public API ---------------------------------------------------------
    def start(self) -> None:
        if self._running:
            return
        self._running = True
        self.monitor.start_sampling()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="deeppowers-scheduler")
        self._thread.start()

    def stop(self, timeout: float = 10.0) -> None:
        self._running = False
        self._wake.set()
        if self._thread:
            self._thread.join(timeout)
            self._thread = None
        self.monitor.stop_sampling()

    def submit(self, request: Request) -> Request:
        """Enqueue with admission control (reference: scheduler.cpp:66-88)."""
        if self.config.enable_admission_control:
            total = len(self.queue) + self.engine.active_requests
            if total >= self.config.max_active_requests:
                self.dropped_requests += 1
                request.mark_failed("admission rejected: at capacity")
                self.monitor.record_request(0, error="admission_reject")
                return request
        try:
            self.queue.enqueue(request)
        except QueueFullError as e:
            self.dropped_requests += 1
            request.mark_failed(str(e))
            self.monitor.record_request(0, error="queue_full")
            return request
        self.monitor.queue_depth = len(self.queue)
        self._wake.set()
        return request

    def submit_sync(self, request: Request,
                    timeout: Optional[float] = None) -> Request:
        """Blocking submit (reference: generate_handler.cpp:50 submit_sync)."""
        self.submit(request)
        if request.status == RequestStatus.FAILED:
            return request
        timeout = timeout or self.engine.runtime.request_timeout_s
        if not request.wait(timeout):
            self.cancel(request.request_id)
            request.mark_failed("timeout")
            self.monitor.record_request(0, error="timeout")
        return request

    def cancel(self, request_id: str) -> bool:
        """Cancel a queued or in-flight request.

        In-flight cancels are DEFERRED to the scheduler loop (round 4): the
        engine is single-threaded by design — its step() donates the cache/
        state buffers to the device, and a cancel from the HTTP/timeout
        thread would rebuild state from handles the in-flight dispatch just
        consumed ("Array has been deleted", a flaky use-after-donate the
        submit_sync timeout test exposed). The loop drains pending cancels
        between steps, re-checking slot ownership (the slot may have
        retired and been re-admitted while the cancel was in flight)."""
        if self.queue.cancel(request_id):
            return True
        for slot, req in list(self._by_slot.items()):
            if req.request_id == request_id:
                self._pending_cancels.append((slot, request_id))
                self._wake.set()
                return True
        return False

    def _drain_cancels(self) -> None:
        while self._pending_cancels:
            slot, rid = self._pending_cancels.pop(0)
            req = self._by_slot.get(slot)
            if req is None or req.request_id != rid:
                continue               # already finished / slot re-used
            try:
                self.engine.cancel(slot)
            except Exception:          # pragma: no cover
                traceback.print_exc()

    def is_healthy(self) -> bool:
        """reference: scheduler.cpp:281-296."""
        return (self._running and
                (self._thread is not None and self._thread.is_alive()))

    def stats(self) -> Dict:
        """reference: scheduler.hpp:42-50 SchedulerStats."""
        return {
            "queued": len(self.queue),
            "active": self.engine.active_requests,
            "free_slots": len(self.engine.free_slots),
            "dropped": self.dropped_requests,
            "preempted": getattr(self, "preempted_requests", 0),
            "prefix_cache": self.engine.prefix_cache_stats,
            "steps": self.engine.steps,
            "healthy": self.is_healthy(),
            "speculative": {
                "window_mean_accepted": round(self.engine.spec_window_mean, 3),
                "accept_hist": self.engine.spec_accept_hist.tolist(),
                "disabled": self.engine.spec_disabled,
            },
        }

    # -- the loop -----------------------------------------------------------
    def _loop(self) -> None:
        while self._running:
            try:
                self._drain_cancels()
                self._admit()
                self._finalize()   # requests can finish at admission time
                # one prefill chunk per loop turn, interleaved with decode —
                # long prompts never head-of-line-block running requests
                # (Sarathi-style chunked prefill)
                for slot in self.engine.prefilling_slots[:1]:
                    self.engine.continue_prefill(slot)
                    self._finalize()
                if self.engine.active_requests == 0:
                    if not self.engine.prefilling_slots:
                        self._wake.wait(self.config.batch_timeout_ms / 1e3)
                        self._wake.clear()
                    continue
                import time as _time
                t0 = _time.monotonic()
                toks = self.engine.step()
                self.monitor.record_step((_time.monotonic() - t0) * 1e3)
                self._stream(toks)
                self._finalize()
                self._consecutive_failures = 0
            except Exception:
                traceback.print_exc()
                self._recover()

    def _recover(self) -> None:
        """Fault recovery: reset the engine and requeue in-flight requests
        (reference: handle_worker_failure — mark inactive, drain local queue
        back via requeue_request with status reset to PENDING,
        scheduler.cpp:260-279; recover_failed_requests was a TODO there).
        After max_consecutive_failures, fail the in-flight requests instead
        of thrashing."""
        self._consecutive_failures = getattr(
            self, "_consecutive_failures", 0) + 1
        inflight = list(self._by_slot.values())
        self._by_slot.clear()
        self._emitted_text.clear()
        self._held.clear()
        try:
            self.engine.reset()
        except Exception:                          # pragma: no cover
            traceback.print_exc()
        if self._consecutive_failures > 3:
            for req in inflight:
                req.mark_failed("engine failure (recovery exhausted)")
                self.monitor.record_request(0, error="engine_failure")
            return
        self.recovered_requests = getattr(self, "recovered_requests", 0)
        for req in inflight:
            # back to PENDING and re-enqueued; generation restarts from the
            # prompt (tokens already streamed are superseded by the rerun)
            req.status = RequestStatus.PENDING
            self.recovered_requests += 1
            try:
                self.queue.enqueue(req)
            except QueueFullError:
                req.mark_failed("queue full during recovery")
                self.monitor.record_request(0, error="recovery_drop")

    def _admit(self) -> None:
        # Admission HOLD under churn (round 4): on a high-dispatch-latency
        # runtime every admission interrupts the pipelined decode for
        # several round trips, so trickling arrivals starve decode (the
        # Poisson load bench measured 218 tok/s sustained vs 1672 steady —
        # ~8x collapse at 10 rps). While decode is ACTIVE, hold new
        # admissions up to batch_timeout_ms (reference semantics:
        # scheduler.hpp batch-formation wait) or until a small batch forms,
        # so one interruption admits several requests. An idle engine
        # admits immediately — single-request latency is untouched.
        hold_ms = self.config.batch_timeout_ms
        if hold_ms > 0 and self.engine.active_requests > 0:
            q = len(self.queue)
            free = len(self.engine.free_slots)
            if q == 0 or free == 0:
                self._hold_t0 = None
                return
            if self._hold_t0 is None:
                self._hold_t0 = time.perf_counter()
            # admit when a small batch can actually land in one
            # interruption: enough queued AND enough freed slots (at
            # saturation slots free one by one — without the free-slot
            # bound every single freed slot pays a full pipeline drain)
            want = min(4, q, self.engine.num_slots)
            if (min(q, free) < want
                    and (time.perf_counter() - self._hold_t0) * 1e3
                    < hold_ms):
                return
        self._hold_t0 = None
        # deferred_admission batches every admitted request's first-token
        # harvest into one device transfer (engine round-3 path); streaming
        # of those first tokens begins at the next _stream call
        ctx = getattr(self.engine, "deferred_admission", None)
        if ctx is not None:
            with ctx():
                self._admit_loop()
        else:                                    # pragma: no cover
            self._admit_loop()

    def _admit_loop(self) -> None:
        while self.engine.free_slots and self._running:
            req = self.queue.dequeue(timeout=None)
            self.monitor.queue_depth = len(self.queue)
            if req is None:
                return
            try:
                resume = getattr(req, "_resume", None)
                if resume is not None:
                    # preempted earlier: re-prefill prompt + generated prefix
                    # with the remaining token budget
                    import dataclasses as _dc
                    ids = resume["prompt_ids"] + resume["tokens"]
                    done = len(resume["tokens"])
                    cfg = _dc.replace(
                        req.config,
                        max_tokens=max(1, req.config.max_tokens - done),
                        min_tokens=max(0, req.config.min_tokens - done))
                else:
                    ids = self.encode(req.prompt)
                    cfg = req.config
                req.mark_running()
                # begin_request: short prompts activate immediately; long
                # ones enter chunked prefill, driven from the loop
                slot = self.engine.begin_request(
                    ids, cfg, request_id=req.request_id)
            except NoFreePages:
                # transient: running requests will release pages — requeue
                # and stop admitting this round
                req.status = RequestStatus.PENDING
                self.queue.enqueue(req)
                return
            except Exception as e:
                req.mark_failed(str(e))
                self.monitor.record_request(0, error="add_request")
                continue
            self.monitor.active_requests = self.engine.active_requests
            # engine may finish a request on its very first token
            base_emitted = (resume or {}).get("emitted", "")
            if self.engine._slots[slot] is not None and \
                    self.engine._slots[slot].request_id == req.request_id:
                self._by_slot[slot] = req
                self._emitted_text[slot] = base_emitted
                self._stream({slot: None})   # flush the prefill-sampled token
            else:
                self._by_slot[slot] = req
                self._emitted_text[slot] = base_emitted
                self._finalize()

    def _stream(self, toks: Dict[int, Optional[int]]) -> None:
        for slot in toks:
            req = self._by_slot.get(slot)
            if req is None:
                continue
            res = self.engine._slots[slot]
            if res is None:
                continue  # finished this step; handled in _finalize
            text = self.decode(self._full_tokens(req, res.token_ids))
            # stop-string scan (reference: RequestConfig.stop_tokens,
            # request.hpp:33)
            if req.config.stop_tokens:
                cut = _find_stop(text, req.config.stop_tokens)
                if cut is not None:
                    final = text[:cut]
                    self._emit_delta(slot, req, final)
                    req.result.stop_reason = "stop_string"
                    self.engine.cancel(slot)
                    continue
            self._emit_delta(slot, req, text)

    def _emit_delta(self, slot: int, req: Request, text: str) -> None:
        prev = self._emitted_text.get(slot, "")
        if len(text) > len(prev) and req.stream_callback is not None:
            delta = text[len(prev):]
            # Hold back a trailing replacement char for one step (possible
            # partial UTF-8); a persistent one is genuinely invalid — emit.
            if delta.endswith("�") and not self._held.get(slot):
                self._held[slot] = True
                return
            self._held.pop(slot, None)
            if not req.stream_callback(delta):
                req.result.stop_reason = "cancelled"
                self.engine.cancel(slot)
        self._emitted_text[slot] = text

    def _finalize(self) -> None:
        for res in self.engine.pop_finished():
            slot = None
            for s, req in list(self._by_slot.items()):
                if req.request_id == res.request_id:
                    slot = s
                    break
            if slot is None:
                continue
            req = self._by_slot.pop(slot)
            emitted = self._emitted_text.pop(slot, "")
            if res.stop_reason == "preempted":
                self._requeue_preempted(req, res, emitted)
            else:
                self._complete(req, res, emitted)
            self.monitor.active_requests = self.engine.active_requests

    def _requeue_preempted(self, req: Request, res: SlotResult,
                           emitted: str) -> None:
        """A preempted request resumes from its generated prefix: accumulate
        this segment, put the request back in the queue (engine preemption —
        runtime/engine.preempt; LIFO victims under page-pool pressure)."""
        st = getattr(req, "_resume", None)
        if st is None:
            st = req._resume = {"prompt_ids": self.encode(req.prompt),
                                "tokens": [], "logprobs": [], "top": []}
        st["tokens"] += list(res.token_ids)
        st["logprobs"] += list(res.logprobs)
        st["top"] += list(res.top_tokens)
        st["emitted"] = emitted
        self.preempted_requests = getattr(self, "preempted_requests", 0) + 1
        req.status = RequestStatus.PENDING
        try:
            self.queue.enqueue(req)
        except QueueFullError:
            req.mark_failed("queue full after preemption")
            self.monitor.record_request(0, error="preempt_drop")

    def _full_tokens(self, req: Request, seg_tokens) -> List[int]:
        st = getattr(req, "_resume", None)
        if st is None:
            return list(seg_tokens)
        return st["tokens"] + list(seg_tokens)

    def _complete(self, req: Request, res: SlotResult, emitted: str) -> None:
        st = getattr(req, "_resume", None)
        all_tokens = self._full_tokens(req, res.token_ids)
        all_logprobs = (st["logprobs"] if st else []) + list(res.logprobs)
        all_top = (st["top"] if st else []) + list(res.top_tokens)
        if st is not None:
            emitted = emitted or st.get("emitted", "")
        text = self.decode(all_tokens)
        if req.config.stop_tokens:
            cut = _find_stop(text, req.config.stop_tokens)
            if cut is not None:
                text = text[:cut]
                if not res.stop_reason or res.stop_reason == "max_tokens":
                    res.stop_reason = "stop_string"
        if req.stream_callback is not None and len(text) > len(emitted):
            req.stream_callback(text[len(emitted):])
        r = req.result
        r.text = text
        r.token_ids = all_tokens
        r.logprobs = all_logprobs
        r.top_tokens = all_top
        r.stop_reason = req.result.stop_reason or res.stop_reason
        r.prompt_tokens = (len(st["prompt_ids"]) if st else res.prompt_len)
        r.completion_tokens = len(all_tokens)
        r.ttft_ms = res.ttft_ms
        r.total_time_ms = res.generation_time * 1e3
        from .request import Span
        r.spans = [
            Span("queue_wait", req.wait_time_s * 1e3),
            Span("prefill_to_first_token", res.ttft_ms),
            Span("decode", max(0.0, r.total_time_ms - res.ttft_ms)),
        ]
        if req.status == RequestStatus.RUNNING:
            req.mark_completed()
        self.monitor.record_latency("request", r.total_time_ms)
        self.monitor.record_latency("ttft", r.ttft_ms)
        self.monitor.record_request(r.completion_tokens)

    def _fail_all(self, msg: str) -> None:
        for slot, req in list(self._by_slot.items()):
            req.mark_failed(msg)
        self._by_slot.clear()


def _find_stop(text: str, stops) -> Optional[int]:
    cuts = [text.find(s) for s in stops if s and text.find(s) >= 0]
    return min(cuts) if cuts else None
