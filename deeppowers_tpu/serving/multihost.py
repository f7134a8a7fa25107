"""Multi-host coordinated continuous batching.

SURVEY.md §7 build plan item 6: "cross-host coordinated continuous batching
(one scheduler host broadcasting per-step batch composition)". In a
multi-process JAX program every process must issue identical jitted steps in
lockstep — so all *host-side* decisions (which request enters which slot,
with which sampling params; how many decode steps to run) are made once by
the leader (process 0, which also runs the HTTP/gRPC front-end and the
request queue) and broadcast to every process before the corresponding
engine calls.

Decisions are encoded into fixed-shape int32/float32 arrays (broadcastable
via jax.experimental.multihost_utils.broadcast_one_to_all) — variable-length
prompts are padded to max_prompt and counted. On a single process the
broadcast is the identity, so the whole path is unit-testable without a pod.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import numpy as np

from ..config import GenerationConfig

_MAX_ADMITS_PER_STEP = 8


@dataclass
class Admission:
    slot: int
    token_ids: List[int]
    gen: GenerationConfig
    request_id: str = ""


@dataclass
class StepDecision:
    """One coordination round: admissions to apply, then decode steps."""

    admissions: List[Admission] = field(default_factory=list)
    decode_steps: int = 1
    stop: bool = False


# GenerationConfig fields shipped per admission (order matters)
_GEN_FIELDS = ("max_tokens", "min_tokens", "temperature", "top_k", "top_p",
               "repetition_penalty", "presence_penalty", "frequency_penalty")


def encode_decision(d: StepDecision, max_prompt: int
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (header int32 (4,), prompts int32 (A, max_prompt+2),
    gen f32 (A, len(_GEN_FIELDS)+2)) with A = _MAX_ADMITS_PER_STEP."""
    a = _MAX_ADMITS_PER_STEP
    header = np.array([len(d.admissions), d.decode_steps, int(d.stop), 0],
                      dtype=np.int32)
    prompts = np.zeros((a, max_prompt + 2), dtype=np.int32)
    gens = np.zeros((a, len(_GEN_FIELDS) + 2), dtype=np.float32)
    for i, adm in enumerate(d.admissions[:a]):
        ids = adm.token_ids[:max_prompt]
        prompts[i, 0] = adm.slot
        prompts[i, 1] = len(ids)
        prompts[i, 2:2 + len(ids)] = ids
        for j, name in enumerate(_GEN_FIELDS):
            gens[i, j] = float(getattr(adm.gen, name))
        gens[i, -2] = 1.0 if adm.gen.do_sample else 0.0
        gens[i, -1] = float(adm.gen.seed if adm.gen.seed is not None else -1)
    return header, prompts, gens


def decode_decision(header: np.ndarray, prompts: np.ndarray,
                    gens: np.ndarray) -> StepDecision:
    n, steps, stop, _ = [int(x) for x in header]
    admissions = []
    for i in range(n):
        ln = int(prompts[i, 1])
        kw = {name: (int(v) if name in ("max_tokens", "min_tokens", "top_k")
                     else float(v))
              for name, v in zip(_GEN_FIELDS, gens[i])}
        seed = int(gens[i, -1])
        admissions.append(Admission(
            slot=int(prompts[i, 0]),
            token_ids=[int(t) for t in prompts[i, 2:2 + ln]],
            gen=GenerationConfig(do_sample=bool(gens[i, -2] > 0),
                                 seed=None if seed < 0 else seed, **kw),
        ))
    return StepDecision(admissions=admissions, decode_steps=steps,
                        stop=bool(stop))


def broadcast_decision(d: Optional[StepDecision], max_prompt: int
                       ) -> StepDecision:
    """Leader passes its decision; followers pass None. Single-process: the
    identity."""
    if jax.process_count() == 1:
        assert d is not None
        return d
    from jax.experimental import multihost_utils
    if d is None:
        d = StepDecision()          # follower placeholder (same shapes)
    arrays = encode_decision(d, max_prompt)
    out = multihost_utils.broadcast_one_to_all(arrays)
    return decode_decision(*[np.asarray(x) for x in out])


class CoordinatedEngine:
    """Drives one engine in lockstep across processes.

    The leader decides (from its queue/scheduler), every process applies:

        driver = CoordinatedEngine(engine, max_prompt=2048)
        # leader:   driver.run(decision)
        # follower: driver.run(None)  (in a loop until decision.stop)
    """

    def __init__(self, engine, max_prompt: int):
        self.engine = engine
        self.max_prompt = max_prompt
        self.is_leader = jax.process_index() == 0

    def run(self, decision: Optional[StepDecision]):
        """One coordination round. Returns (decision, step_tokens) — the
        decision actually applied (leader's, post-broadcast) and the decode
        outputs on this process."""
        d = broadcast_decision(decision, self.max_prompt)
        if d.stop:
            return d, {}
        for adm in d.admissions:
            self.engine.add_request(adm.token_ids, adm.gen,
                                    request_id=adm.request_id)
        toks = {}
        for _ in range(d.decode_steps):
            out = self.engine.step()
            for slot, ts in out.items():
                toks.setdefault(slot, []).extend(ts)
            if self.engine.active_requests == 0:
                break
        return d, toks
