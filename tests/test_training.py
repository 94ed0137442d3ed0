"""O31 train/eval drivers (operators/training.py): distributed
full-batch GD — learning curves, checkpoint/resume, numpy parity, and
the TypeRec plug-in path (reference typerec/train.py, disamb/train.py)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from type_filtered_entity_linker_spark.config import LinkerConfig
from type_filtered_entity_linker_spark.operators.mentions import (
    detect_mentions_df,
    with_extracted_text,
)
from type_filtered_entity_linker_spark.operators.training import (
    pair_feature_samples,
    train_logistic,
    train_softmax,
)
from type_filtered_entity_linker_spark.operators.typerec import (
    TYPE_CLASSES,
    with_predicted_types,
)


def _separable_samples(spark, n=200, seed=7):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 2, n)
    # f1 informative, f2 noise
    f1 = y + rng.randn(n) * 0.2
    f2 = rng.randn(n)
    return spark.createDataFrame(
        pd.DataFrame({"f1": f1, "f2": f2, "label": y})
    )


def test_logistic_loss_decreases_and_separates(spark):
    s = _separable_samples(spark)
    model, curve = train_logistic(s, ["f1", "f2"], epochs=6, lr=2.0)
    losses = [c["loss"] for c in curve]
    assert losses[-1] < losses[0] * 0.7
    assert curve[-1]["acc"] >= 0.95
    # informative feature got the weight
    assert abs(model["w"][0]) > abs(model["w"][1])


def test_logistic_checkpoint_resume(spark, tmp_path):
    s = _separable_samples(spark)
    wd = str(tmp_path / "ckpt")
    # uninterrupted run
    model_full, curve_full = train_logistic(s, ["f1", "f2"], epochs=4, lr=2.0)
    # killed after epoch 2 (simulated by training 2 epochs into wd) ...
    train_logistic(s, ["f1", "f2"], epochs=2, lr=2.0, workdir=wd)
    # ... then resumed to 4: must land on the identical weights/curve
    model_res, curve_res = train_logistic(
        s, ["f1", "f2"], epochs=4, lr=2.0, workdir=wd, resume=True
    )
    assert np.allclose(model_res["w"], model_full["w"], atol=1e-12)
    assert abs(model_res["b"] - model_full["b"]) < 1e-12
    # curve epochs 1..2 come from the checkpoint, 3..4 recomputed
    assert [c["epoch"] for c in curve_res] == [c["epoch"] for c in curve_full]
    for a, b in zip(curve_res, curve_full):
        assert abs(a["loss"] - b["loss"]) < 1e-12


def test_logistic_resume_ignores_checkpoints_past_horizon(spark, tmp_path):
    """A workdir holding checkpoints from an earlier LONGER run must
    not leak over-trained weights into a shorter resume: epoch_NNN
    files beyond the requested ``epochs`` are ignored (code-review
    r03 — the old code resumed from max(all checkpoints), skipped the
    loop, and returned 6-epoch weights with a malformed curve)."""
    s = _separable_samples(spark)
    wd = str(tmp_path / "ckpt")
    train_logistic(s, ["f1", "f2"], epochs=6, lr=2.0, workdir=wd)
    model_4, curve_4 = train_logistic(
        s, ["f1", "f2"], epochs=4, lr=2.0, workdir=wd, resume=True
    )
    model_ref, curve_ref = train_logistic(s, ["f1", "f2"], epochs=4, lr=2.0)
    assert np.allclose(model_4["w"], model_ref["w"], atol=1e-12)
    assert [c["epoch"] for c in curve_4] == [c["epoch"] for c in curve_ref]


def _blob_data(n_per=60, K=3, D=8, seed=11):
    rng = np.random.RandomState(seed)
    centers = rng.randn(K, D) * 3
    X = np.concatenate(
        [centers[k] + rng.randn(n_per, D) for k in range(K)]
    )
    y = np.repeat(np.arange(K), n_per)
    return X, y


def test_softmax_learns_blobs_and_matches_numpy(spark):
    X, y = _blob_data()
    K, D = 3, 8
    df = spark.createDataFrame(
        pd.DataFrame({"e": list(X), "label_idx": y})
    ).select(F.col("e").cast("array<double>").alias("e"), "label_idx")
    epochs, lr = 5, 1.0
    W, b, curve = train_softmax(df, "e", K, D, epochs=epochs, lr=lr)
    losses = [c["loss"] for c in curve]
    assert losses[-1] < losses[0]
    assert curve[-1]["acc"] >= 0.9

    # single-process reference: identical math, one big batch
    Wr = np.zeros((K, D))
    br = np.zeros(K)
    n = len(y)
    Y1 = np.eye(K)[y]
    for _ in range(epochs):
        Z = X @ Wr.T + br
        Z -= Z.max(axis=1, keepdims=True)
        P = np.exp(Z)
        P /= P.sum(axis=1, keepdims=True)
        G = P - Y1
        Wr -= lr * (G.T @ X) / n
        br -= lr * G.sum(axis=0) / n
    assert np.allclose(W, Wr, atol=1e-9)
    assert np.allclose(b, br, atol=1e-9)


def test_softmax_checkpoint_resume(spark, tmp_path):
    X, y = _blob_data(n_per=30)
    df = spark.createDataFrame(
        pd.DataFrame({"e": list(X), "label_idx": y})
    ).select(F.col("e").cast("array<double>").alias("e"), "label_idx")
    wd = str(tmp_path / "ckpt")
    W_full, b_full, _ = train_softmax(df, "e", 3, 8, epochs=4)
    train_softmax(df, "e", 3, 8, epochs=2, workdir=wd)
    W_res, b_res, _ = train_softmax(
        df, "e", 3, 8, epochs=4, workdir=wd, resume=True
    )
    assert np.allclose(W_res, W_full, atol=1e-12)
    assert np.allclose(b_res, b_full, atol=1e-12)


def test_trained_weights_plug_into_typerec(spark):
    from type_filtered_entity_linker_spark.functions.strings import (
        EMB_DIM,
        embed_texts,
    )

    mats = embed_texts(["alpha corp | ctx one", "beta city | ctx two"])
    rows = [(u, m.tobytes()) for u, m in zip(["u1", "u2"], mats)]
    mentions = spark.createDataFrame(rows, "url string, m_emb binary")
    # weights that force every mention to class 3: W[3] = sum of the
    # actual embeddings (positive self-dot), all other rows zero
    W = np.zeros((len(TYPE_CLASSES), EMB_DIM), dtype=np.float32)
    W[3] = mats.sum(axis=0)
    out = with_predicted_types(mentions, weights=W).collect()
    assert {r.m_type for r in out} == {TYPE_CLASSES[3]}


def test_pair_scorer_calibration_on_fixture(spark, fx, inputs):
    """End-to-end O31 disamb path: labeled mention pairs at the
    blocking key (the acceptance metric's own pair set) → similarity
    features via the scorer's kernels → logistic calibration. The
    trained head must separate same-entity from different-entity pairs
    far better than the zero-weight head (acc 50%-ish prior)."""
    cfg = LinkerConfig()
    pages_text = with_extracted_text(inputs["pages"], cfg)
    mentions = detect_mentions_df(pages_text, inputs["gazetteer"], cfg)
    lp = spark.createDataFrame(fx["labeled_pairs"])
    samples = pair_feature_samples(lp, mentions)
    model, curve = train_logistic(
        samples, ["f_cos", "f_jw", "f_lev"], epochs=5, lr=2.0
    )
    assert curve[-1]["loss"] < curve[0]["loss"]
    assert curve[-1]["acc"] >= 0.9
    # cosine of the context embedding should carry positive weight
    assert model["w"][0] > 0
