"""Quantization sweep: INT8 / INT4 / MIXED with size + quality deltas
(reference: examples/quantization_example.cpp:73-90 — per-layer mixed
precisions {attention: int8, ffn: int4}, model-size and quality deltas)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import copy

import numpy as np

import deeppowers_tpu as dp
from deeppowers_tpu.quant.validate import validate_quantized_params
from deeppowers_tpu.runtime.evaluate import delta_ppl


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gpt2")
    ap.add_argument("--group-size", type=int, default=0)
    args = ap.parse_args()

    base = dp.load_model(args.model)
    fp_params = base.params
    fp_bytes = base.nbytes
    print(f"fp model: {fp_bytes / 1e6:.1f} MB")

    rng = np.random.default_rng(0)
    calib = [rng.integers(0, base.cfg.vocab_size, size=64).tolist()
             for _ in range(4)]

    for precision in ("int8", "int4", "mixed"):
        model = dp.Model(base.cfg, copy.deepcopy(fp_params),
                         base.tokenizer, runtime=base.runtime)
        dp.quantize_model(model, precision, group_size=args.group_size)
        ratio = model.nbytes / fp_bytes
        report = validate_quantized_params(fp_params, model.params,
                                           tolerance=0.5)
        ppl = delta_ppl(fp_params, model.params, model.cfg, calib)
        print(f"{precision:>6}: size x{ratio:.2f}  "
              f"worst weight err {report.summary['worst_max_abs_error']:.4f}  "
              f"delta_ppl {ppl['delta_ppl']:+.4f} "
              f"(ppl {ppl['ppl_ref']:.1f} -> {ppl['ppl_quant']:.1f})")


if __name__ == "__main__":
    main()
