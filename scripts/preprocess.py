"""Corpus preprocessing for tokenizer training / quantization calibration.

Reference analogue: scripts/preprocess.py (clean + normalize text files
into line-JSON for the tokenizer: unicode NFKC, URL/email stripping,
number normalization, length filtering, parallel over files). Rebuilt here
for the TPU stack's consumers: `serving.tokenizer.BPETokenizer.train`
corpora and `apply_quantization(calibration=...)` / GPTQ sample sets.

Usage:
  python scripts/preprocess.py --input docs/ --output /tmp/corpus \
      --pattern '*.md' --min-length 32 --max-length 2048
Outputs one cleaned text per line in <output>/corpus.jsonl plus stats.
"""

import argparse
import json
import re
import unicodedata
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

_URL = re.compile(r"https?://\S+")
_EMAIL = re.compile(r"[\w.+-]+@[\w-]+\.[\w.-]+")
_NUM = re.compile(r"\d+(?:\.\d+)?")
_CTRL = re.compile(r"[\x00-\x08\x0b-\x1f\x7f-\x9f]")
_WS = re.compile(r"[ \t]+")


def clean_text(text: str, *, normalize_unicode: bool = True,
               remove_urls: bool = True, remove_emails: bool = True,
               normalize_numbers: bool = False,
               keep_newlines: bool = True) -> str:
    """Clean one document. Defaults differ deliberately from the reference:
    numbers are KEPT by default (calibration text should look like serving
    traffic), and newlines survive (byte-level tokenizers model them)."""
    text = _CTRL.sub(" ", text)
    if normalize_unicode:
        text = unicodedata.normalize("NFKC", text)
    if remove_urls:
        text = _URL.sub(" ", text)
    if remove_emails:
        text = _EMAIL.sub(" ", text)
    if normalize_numbers:
        text = _NUM.sub("0", text)
    if keep_newlines:
        text = "\n".join(_WS.sub(" ", ln).strip() for ln in text.split("\n"))
        text = re.sub(r"\n{3,}", "\n\n", text)
    else:
        text = _WS.sub(" ", text.replace("\n", " "))
    return text.strip()


def _process_one(path_str: str, min_len: int, max_len: int,
                 chunk: bool) -> list:
    try:
        raw = Path(path_str).read_text(encoding="utf-8", errors="replace")
    except OSError:
        return []
    text = clean_text(raw)
    if len(text) < min_len:
        return []
    if not chunk:
        return [text[:max_len]]
    out = []
    for start in range(0, len(text), max_len):
        piece = text[start:start + max_len]
        if len(piece) >= min_len:
            out.append(piece)
    return out


def main():
    ap = argparse.ArgumentParser(
        description="Preprocess text for tokenizer training / calibration")
    ap.add_argument("--input", required=True, help="file or directory")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--pattern", default="*.txt",
                    help="glob when --input is a directory")
    ap.add_argument("--min-length", type=int, default=10)
    ap.add_argument("--max-length", type=int, default=4096)
    ap.add_argument("--chunk", action="store_true",
                    help="split long documents into max-length pieces "
                         "instead of truncating")
    ap.add_argument("--workers", type=int, default=4)
    args = ap.parse_args()

    inp = Path(args.input)
    files = ([inp] if inp.is_file()
             else sorted(inp.rglob(args.pattern)))
    if not files:
        raise SystemExit(f"no files match {args.pattern!r} under {inp}")

    outdir = Path(args.output)
    outdir.mkdir(parents=True, exist_ok=True)
    texts: list = []
    with ProcessPoolExecutor(max_workers=args.workers) as pool:
        for res in pool.map(_process_one, [str(f) for f in files],
                            [args.min_length] * len(files),
                            [args.max_length] * len(files),
                            [args.chunk] * len(files)):
            texts.extend(res)

    out_path = outdir / "corpus.jsonl"
    with open(out_path, "w", encoding="utf-8") as f:
        for t in texts:
            f.write(json.dumps({"text": t}) + "\n")
    stats = {
        "files_in": len(files),
        "documents_out": len(texts),
        "total_chars": sum(len(t) for t in texts),
        "mean_chars": (sum(len(t) for t in texts) // max(len(texts), 1)),
    }
    with open(outdir / "stats.json", "w") as f:
        json.dump(stats, f, indent=2)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
