"""O31 — train/eval drivers (reference ``typerec/train.py:13-57``,
``disamb/train.py:20-59``; epoch loop ``typerec/model.py:77-138``,
``disamb/model.py:203-214``) as DRIVER-COORDINATED distributed
full-batch gradient descent.

The reference trains two models: the disambiguation pair scorer (binary
— correct vs wrong candidate, ``disamb/model.py``) and the TypeRec
mention-type classifier (multiclass over 12 supertypes,
``typerec/model.py``). Both translate to the standard Spark
"broadcast parameters + aggregate gradients" pattern (the shape MLlib's
LogisticRegression uses via treeAggregate): model state is a few KB of
weights on the driver; each epoch is ONE distributed aggregation job
over the (never-collected) sample table, and the driver applies the
update. At 10^12 rows the per-epoch job is a map-side partial gradient
per partition + a tree reduction — no shuffle of the data itself, no
driver materialization of samples.

Two gradient kernels:

- ``train_logistic`` (binary head): gradient, loss and accuracy are
  pure COLUMN EXPRESSIONS — zero UDFs, the whole epoch runs inside
  whole-stage codegen. Used for calibrating the pair-score combination
  weights (reference disamb head: one sigmoid over a small feature
  interaction, disamb/model.py:73-84).
- ``train_softmax`` (TypeRec multiclass): per-partition numpy GEMM
  partials via ``mapInPandas`` (Arrow batches, no per-row Python),
  summed on the driver — (K×dim) float64 per partition, independent of
  row count.

Checkpoint-per-epoch (reference ``typerec/model.py:117``): each epoch's
weights land in ``workdir/epoch_NNN.json``; ``resume=True`` skips
completed epochs and continues from the last checkpoint, so a killed
training run restarts mid-curve (the pipeline's resumability contract
applied to training).

Epoch semantics (shared by both kernels and the DuckDB oracles): the
metrics recorded for epoch e are measured at the weights ENTERING the
epoch (loss/accuracy before the update), then one full-batch step is
applied. ``curve[-1]`` therefore describes the final weights if you
train for ``epochs`` and evaluate once more — ``train_*`` appends that
final evaluation row with ``epoch = epochs + 1`` (the reference's
per-epoch test pass, ``typerec/test.py:50-54``).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# clamp for log-loss; applied identically in the DuckDB oracles so the
# loss values agree bit-for-bit at any weight vector
EPS = 1e-12


def _latest_checkpoint(workdir: str, epochs: int) -> dict | None:
    """Newest ``epoch_N.json`` with N <= the requested horizon. Epoch
    numbers are parsed numerically (lexicographic sort breaks past
    999), and checkpoints BEYOND ``epochs`` — left by an earlier,
    longer run into the same workdir — are ignored: resuming from one
    would skip the loop entirely and return over-trained weights with
    a malformed curve (code-review r03)."""
    best: tuple[int, str] | None = None
    for f in os.listdir(workdir):
        if not (f.startswith("epoch_") and f.endswith(".json")):
            continue
        try:
            ep = int(f[len("epoch_"):-len(".json")])
        except ValueError:
            continue
        if ep <= epochs and (best is None or ep > best[0]):
            best = (ep, f)
    if best is None:
        return None
    with open(os.path.join(workdir, best[1])) as fh:
        return json.load(fh)


# --------------------------------------------------------------- logistic

def _logistic_epoch(
    samples: DataFrame, feat_cols: list[str], w: list[float], b: float
) -> dict:
    """One full-batch pass at (w, b): mean gradient, mean log-loss and
    accuracy — all as built-in column expressions (one codegen'd
    aggregation job, no UDF)."""
    z = F.lit(float(b))
    for wi, c in zip(w, feat_cols):
        z = z + F.lit(float(wi)) * F.col(c)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    y = F.col("label").cast("double")
    pc = F.least(F.greatest(p, F.lit(EPS)), F.lit(1.0 - EPS))
    loss = -(y * F.log(pc) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - pc))
    correct = ((p >= 0.5).cast("double") == y).cast("double")
    aggs = [F.avg((p - y) * F.col(c)).alias(f"g_{c}") for c in feat_cols]
    aggs += [
        F.avg(p - y).alias("g_b"),
        F.avg(loss).alias("loss"),
        F.avg(correct).alias("acc"),
    ]
    row = samples.agg(*aggs).first().asDict()
    return row


def train_logistic(
    samples: DataFrame,
    feat_cols: list[str],
    epochs: int = 4,
    lr: float = 1.0,
    l2: float = 0.0,
    workdir: str | None = None,
    resume: bool = True,
) -> tuple[dict, list[dict]]:
    """Binary head trainer. ``samples`` needs ``feat_cols`` (double)
    and ``label`` (0/1). Returns ``({"w": [...], "b": float}, curve)``
    where curve rows are {epoch, loss, acc, w..., b} — weights AFTER
    that epoch's update, metrics BEFORE it (see module docstring).

    The sample table is persisted for the epoch loop (each epoch is a
    full pass; without it every epoch re-executes the feature lineage)
    and released before returning."""
    samples = samples.persist()
    w = [0.0] * len(feat_cols)
    b = 0.0
    curve: list[dict] = []
    start = 0
    if workdir:
        os.makedirs(workdir, exist_ok=True)
        if resume:
            st = _latest_checkpoint(workdir, epochs)
            if st is not None:
                w, b = list(st["w"]), float(st["b"])
                curve = list(st["curve"])
                start = int(st["epoch"])
    for e in range(start, epochs):
        m = _logistic_epoch(samples, feat_cols, w, b)
        w = [
            wi - lr * (m[f"g_{c}"] + l2 * wi)
            for wi, c in zip(w, feat_cols)
        ]
        b = b - lr * m["g_b"]
        rec = {"epoch": e + 1, "loss": m["loss"], "acc": m["acc"]}
        rec.update({f"w_{c}": wi for c, wi in zip(feat_cols, w)})
        rec["b"] = b
        curve.append(rec)
        if workdir:
            with open(
                os.path.join(workdir, f"epoch_{e + 1:03d}.json"), "w"
            ) as fh:
                json.dump(
                    {"epoch": e + 1, "w": w, "b": b, "curve": curve}, fh
                )
    # final evaluation at the trained weights (reference's test pass)
    m = _logistic_epoch(samples, feat_cols, w, b)
    rec = {"epoch": epochs + 1, "loss": m["loss"], "acc": m["acc"]}
    rec.update({f"w_{c}": wi for c, wi in zip(feat_cols, w)})
    rec["b"] = b
    curve = curve + [rec]
    samples.unpersist()
    return {"w": w, "b": b}, curve


# ---------------------------------------------------------------- softmax

def _softmax_partials(
    df: DataFrame, emb_col: str, W: np.ndarray, b: np.ndarray
) -> tuple[np.ndarray, np.ndarray, float, int, int]:
    """One epoch's partial statistics: per-partition (grad_W, grad_b,
    loss_sum, correct, n) via Arrow-batched GEMMs, summed on the
    driver. The emitted rows are O(partitions), each K×dim doubles —
    at cluster scale swap the final sum for a treeAggregate-style
    two-level reduce; the kernel is unchanged."""
    K, D = W.shape
    bw, bb = W.copy(), b.copy()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gW = np.zeros((K, D))
        gb = np.zeros(K)
        loss = 0.0
        correct = 0
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[emb_col].to_numpy())  # (n, D) float64
            y = pdf["label_idx"].to_numpy()
            Z = X @ bw.T + bb  # (n, K)
            Z -= Z.max(axis=1, keepdims=True)  # stable softmax
            P = np.exp(Z)
            P /= P.sum(axis=1, keepdims=True)
            idx = np.arange(len(y))
            loss += float(-np.log(np.maximum(P[idx, y], EPS)).sum())
            correct += int((P.argmax(axis=1) == y).sum())
            P[idx, y] -= 1.0  # P - onehot(y)
            gW += P.T @ X
            gb += P.sum(axis=0)
            n += len(y)
        yield pd.DataFrame(
            {
                "gw": [gW.ravel().tolist()],
                "gb": [gb.tolist()],
                "loss": [loss],
                "correct": [correct],
                "n": [n],
            }
        )

    parts = df.select(emb_col, "label_idx").mapInPandas(
        run,
        "gw array<double>, gb array<double>, loss double, "
        "correct long, n long",
    ).collect()
    gW = np.zeros((K, D))
    gb = np.zeros(K)
    loss, correct, n = 0.0, 0, 0
    for r in parts:
        gW += np.array(r["gw"]).reshape(K, D)
        gb += np.array(r["gb"])
        loss += r["loss"]
        correct += r["correct"]
        n += r["n"]
    return gW, gb, loss, correct, n


def train_softmax(
    df: DataFrame,
    emb_col: str,
    n_classes: int,
    dim: int,
    epochs: int = 2,
    lr: float = 1.0,
    workdir: str | None = None,
    resume: bool = True,
) -> tuple[np.ndarray, np.ndarray, list[dict]]:
    """Multiclass softmax-regression trainer (the TypeRec shape:
    mention representation → 1 of K supertypes). ``df`` needs
    ``emb_col`` (array<double>, length ``dim``) and ``label_idx``
    (int in [0, n_classes)). Zero-initialized; full-batch GD.
    Returns (W, b, curve) — curve rows {epoch, loss, acc} with the
    same before/after semantics as ``train_logistic``; the sample
    table is persisted across the epoch loop like ``train_logistic``."""
    df = df.persist()
    W = np.zeros((n_classes, dim))
    b = np.zeros(n_classes)
    curve: list[dict] = []
    start = 0
    if workdir:
        os.makedirs(workdir, exist_ok=True)
        if resume:
            st = _latest_checkpoint(workdir, epochs)
            if st is not None:
                W = np.array(st["W"]).reshape(n_classes, dim)
                b = np.array(st["b"])
                curve = list(st["curve"])
                start = int(st["epoch"])
    for e in range(start, epochs):
        gW, gb, loss, correct, n = _softmax_partials(df, emb_col, W, b)
        curve.append(
            {"epoch": e + 1, "loss": loss / n, "acc": correct / n}
        )
        W = W - lr * gW / n
        b = b - lr * gb / n
        if workdir:
            with open(
                os.path.join(workdir, f"epoch_{e + 1:03d}.json"), "w"
            ) as fh:
                json.dump(
                    {
                        "epoch": e + 1,
                        "W": W.ravel().tolist(),
                        "b": b.tolist(),
                        "curve": curve,
                    },
                    fh,
                )
    _, _, loss, correct, n = _softmax_partials(df, emb_col, W, b)
    curve = curve + [
        {"epoch": epochs + 1, "loss": loss / n, "acc": correct / n}
    ]
    df.unpersist()
    return W, b, curve


# ----------------------------------------------- domain wiring (fixture)

def pair_feature_samples(
    labeled_pairs: DataFrame, mentions: DataFrame
) -> DataFrame:
    """Training samples for the pair-scorer head from labeled
    mention pairs at the blocking key (the acceptance metric's own
    pair set): per pair, the scorer's three similarity channels —
    context-embedding cosine, Jaro-Winkler and normalized Levenshtein
    of the surface forms — as feature columns + the same_entity label.
    The cosine crosses into Python as one Arrow batch (binary f32
    embeddings, same decode as the scorer); JW/Levenshtein reuse the
    scorer's kernels (strings.py)."""
    from pyspark.sql.types import DoubleType

    from ..functions.strings import jaro_winkler_batch
    from .scoring import decode_f32

    m = mentions.select(
        "url", "mention_id", "sf_norm", "m_emb"
    )
    a = m.toDF("url_a", "mention_id_a", "sf_a", "emb_a")
    bdf = m.toDF("url_b", "mention_id_b", "sf_b", "emb_b")
    pairs = labeled_pairs.join(a, ["url_a", "mention_id_a"]).join(
        bdf, ["url_b", "mention_id_b"]
    )

    @F.pandas_udf(DoubleType())
    def _cos(ea: pd.Series, eb: pd.Series) -> pd.Series:
        n = len(ea)
        if n == 0:
            return pd.Series([], dtype="float64")
        mask = (ea.notna() & eb.notna()).to_numpy()
        out = np.zeros(n)
        if mask.any():
            A = decode_f32(ea, mask)
            B = decode_f32(eb, mask)
            num = np.einsum("ij,ij->i", A, B, dtype=np.float64)
            den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
            out[mask] = num / np.maximum(den, 1e-30)
        return pd.Series(out)

    @F.pandas_udf(DoubleType())
    def _jw(sa: pd.Series, sb: pd.Series) -> pd.Series:
        return pd.Series(
            jaro_winkler_batch(sa.fillna("").tolist(), sb.fillna("").tolist())
        )

    lev = F.levenshtein("sf_a", "sf_b")
    maxlen = F.greatest(F.length("sf_a"), F.length("sf_b"), F.lit(1))
    return pairs.select(
        _cos(F.col("emb_a"), F.col("emb_b")).alias("f_cos"),
        _jw(F.col("sf_a"), F.col("sf_b")).alias("f_jw"),
        (F.lit(1.0) - lev.cast("double") / maxlen).alias("f_lev"),
        F.col("same_entity").cast("int").alias("label"),
    )
