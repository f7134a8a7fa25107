"""Serving pipeline: requests, queue, continuous-batching scheduler, metrics,
HTTP server, tokenizers.

Reference analogue: src/core/request_queue + batching + scheduling +
monitoring + api layers.
"""

from .metrics import AlertThresholds, LatencySnapshot, Monitor
from .queue import QueueFullError, RequestQueue
from .request import Request, RequestPriority, RequestResult, RequestStatus
from .scheduler import Scheduler
from .server import APIServer
from .tokenizer import (
    BPETokenizer,
    ByteTokenizer,
    HFTokenizer,
    TokenizerBase,
    load_tokenizer,
)

__all__ = [
    "AlertThresholds",
    "LatencySnapshot",
    "Monitor",
    "QueueFullError",
    "RequestQueue",
    "Request",
    "RequestPriority",
    "RequestResult",
    "RequestStatus",
    "Scheduler",
    "APIServer",
    "BPETokenizer",
    "ByteTokenizer",
    "HFTokenizer",
    "TokenizerBase",
    "load_tokenizer",
]
