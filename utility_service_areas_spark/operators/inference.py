"""Batch model-inference seam (VERDICT r12 task #4).

The one LLM-pipeline stage with no in-repo implementation is neural
scoring — embedding generation, quality/toxicity classifiers, reward
models. No model runtime exists in this environment, so the stage is
an injectable SEAM with exactly the posture of the fetcher/pdf/media
seams (sources/fetch.py, sources/pdf.py, operators/multimodal.py):

  model_fn(texts: list[str]) -> list[list[float]]

a plain picklable callable that takes a BATCH of strings and returns
one fixed-dimension float vector per input (an embedding, or a 1-dim
score). A production deployment wraps its model server / ONNX session
/ triton client in that signature and passes it to ``infer_batches``;
the engine supplies the batching, Arrow transfer, malformed-input
quarantine, and poison-row isolation.

Contract (pinned clause by clause in tests/test_seam_contracts.py):

- the engine calls ``model_fn`` with lists of at most ``batch_size``
  texts — REAL batches, never one row at a time (amortizing model
  dispatch is the whole point of batch inference);
- malformed input is DATA, not error: null/empty text rows yield
  status='invalid' (output NULL) and the model NEVER sees them;
- a model exception on a batch triggers per-row retry ISOLATION: only
  the poison row(s) get status='error' with 'Type: msg'; healthy rows
  of the same batch still succeed (one bad UTF-8 document cannot sink
  a 64-row batch);
- a per-row output whose dimension disagrees with ``output_dim`` (or
  with the batch's first valid row when unspecified) is itself
  status='error' — shape bugs surface as rows, not crashes;
- exactly ONE output row per input row, schema
  (id, output array<double>, status, error) — downstream joins depend
  on 1:1ness;
- ``default_model`` raises NotImplementedError naming the injection
  point (the environment has no model runtime).

Scale shape: mapInPandas streams Arrow batches through the Python
worker — the corpus is never collected, model calls are
``batch_size``-bounded, and the output adds one array column (the
#176/#49 posture). Row order within a partition is preserved.

The deterministic fake (``fake_hash_model``) derives each component
from an md5 slice of the text — pure arithmetic on a cross-engine
seam, so a registered query running the REAL seam machinery is still
value-oracled exactly (docs_model_quality_scores).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

ModelFn = Callable[[list[str]], list[list[float]]]

FAKE_MODEL_DIM = 4


def default_model(texts: list[str]) -> list[list[float]]:
    """Environment default: no model runtime in this sandbox."""
    raise NotImplementedError(
        "no model runtime in this environment — inject model_fn= into "
        "infer_batches (any callable list[str] -> list[list[float]])"
    )


def fake_hash_model(texts: list[str]) -> list[list[float]]:
    """Deterministic fake: component j = int(md5(text)[4j:4j+4], 16),
    j < 4 — integer-valued doubles (< 2^16, exact), replayable in SQL
    through the '0x'||substr(md5(text),...) integer seam, so queries
    exercising the REAL seam machinery stay value-oracled."""
    out = []
    for t in texts:
        h = hashlib.md5(t.encode("utf-8")).hexdigest()
        out.append(
            [float(int(h[4 * j : 4 * j + 4], 16)) for j in range(FAKE_MODEL_DIM)]
        )
    return out


def infer_batches(
    df: DataFrame,
    model_fn: ModelFn = default_model,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = 64,
    output_dim: int | None = None,
) -> DataFrame:
    """Run ``model_fn`` over ``df[text_col]`` in bounded batches.

    Returns (id_col, output array<double>, status, error) with exactly
    one row per input row; status in ('ok', 'invalid', 'error') —
    see the module docstring for the full seam contract."""
    import pandas as pd

    schema = StructType(
        [
            df.schema[id_col],
            StructField("output", ArrayType(DoubleType())),
            StructField("status", StringType()),
            StructField("error", StringType()),
        ]
    )

    def run_batch(texts: list[str]) -> list[tuple]:
        """(output, status, error) per text — batch call with per-row
        poison isolation on failure."""
        expected = output_dim

        def check(vec) -> tuple:
            nonlocal expected
            vec = [float(x) for x in vec]
            if expected is None:
                expected = len(vec)
            if len(vec) != expected:
                return (
                    None,
                    "error",
                    f"dim mismatch: got {len(vec)}, want {expected}",
                )
            return (vec, "ok", None)

        try:
            outs = model_fn(texts)
            if len(outs) != len(texts):
                raise ValueError(
                    f"model returned {len(outs)} outputs for "
                    f"{len(texts)} inputs"
                )
            return [check(v) for v in outs]
        except Exception:
            # batch failed — isolate the poison row(s): retry one by one
            results = []
            for t in texts:
                try:
                    (v,) = model_fn([t])
                    results.append(check(v))
                except Exception as one_exc:  # noqa: BLE001 — quarantined as data
                    results.append(
                        (None, "error", f"{type(one_exc).__name__}: {one_exc}")
                    )
            return results

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].tolist()
            texts = pdf[text_col].tolist()
            results: list[tuple | None] = [None] * len(ids)
            pending: list[tuple[int, str]] = []
            for i, t in enumerate(texts):
                if t is None or (isinstance(t, str) and t == ""):
                    results[i] = (None, "invalid", "null or empty text")
                else:
                    pending.append((i, t))
            for start in range(0, len(pending), batch_size):
                chunk = pending[start : start + batch_size]
                for (i, _t), res in zip(
                    chunk, run_batch([t for _i, t in chunk])
                ):
                    results[i] = res
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "output": [r[0] for r in results],
                    "status": [r[1] for r in results],
                    "error": [r[2] for r in results],
                }
            )

    return df.select(id_col, text_col).mapInPandas(gen, schema)
