"""Mention-type prediction — the reference's TypeRec classifier path
(O13: DistilBERT over (text, [SEP], mention) → 1 of 12 supertypes,
el/filter.py:31-41 + typerec/model.py:229-246) as batched inference in
a pandas UDF.

The model is a deterministic seeded linear classifier over the
mention's context embedding (the same stand-in policy as the scorer
heads: fixed weights replace the unavailable BERT checkpoint, while the
INFERENCE SHAPE is real — per-executor weight init, Arrow-batched
matrix multiply, argmax with lowest-index tie-break). The pure-Python
oracle imports the same predict function, so filter decisions match
bit-for-bit under ``filter_mode='model'``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..fixtures import OTHER_TYPE, SUPERTYPES
from ..functions.strings import EMB_DIM

TYPE_CLASSES = SUPERTYPES + [OTHER_TYPE]  # 11 + OTHER (typerec/types.py:15-38)

_W_CACHE: dict = {}


def _weights(dim: int = EMB_DIM, seed: int = 17) -> np.ndarray:
    key = (dim, seed)
    if key not in _W_CACHE:
        rng = np.random.RandomState(seed)
        _W_CACHE[key] = rng.randn(len(TYPE_CLASSES), dim).astype(np.float32)
    return _W_CACHE[key]


def predict_supertype_batch(M: np.ndarray, W: np.ndarray | None = None) -> list[str]:
    """(n, dim) mention embeddings → predicted supertype labels.
    argmax over class logits; np.argmax takes the FIRST max, i.e. the
    reference's deterministic lowest-index tie-break. ``W`` (K, dim)
    overrides the seeded weights — e.g. a checkpoint from
    ``operators.training.train_softmax`` (O31)."""
    if W is None:
        W = _weights(M.shape[1])
    logits = M.astype(np.float32, copy=False) @ W.T
    return [TYPE_CLASSES[i] for i in np.argmax(logits, axis=1)]


def with_predicted_types(
    mentions: DataFrame, weights: np.ndarray | None = None
) -> DataFrame:
    """mentions (+ m_emb binary) → + m_type via batched model inference.
    Scalar-iterator UDF: weights initialize once per python worker
    (the reference's lazy per-process model init,
    typerec/model.py:255-262), then every Arrow batch is one GEMM.
    ``weights``: optional trained (K, dim) matrix (train_softmax, O31);
    it rides the UDF closure → Spark broadcasts it to workers."""
    trained = None if weights is None else weights.astype(np.float32)

    @F.pandas_udf(StringType())
    def predict(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        W = _weights() if trained is None else trained  # per-executor init
        for m_emb in batches:
            if len(m_emb) == 0:
                yield pd.Series([], dtype="object")
                continue
            M = np.frombuffer(b"".join(m_emb), dtype=np.float32).reshape(
                len(m_emb), -1
            )
            logits = M @ W.T
            yield pd.Series(
                [TYPE_CLASSES[i] for i in np.argmax(logits, axis=1)]
            )

    return mentions.withColumn("m_type", predict(F.col("m_emb")))
