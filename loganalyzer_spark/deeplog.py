"""EP3: DeepLog exec-path anomaly scoring as a vectorized numeric
kernel inside Arrow batches.

Reference: ``analyzer/modern/deeplog/models.py:17-63`` (DeepLogExec —
2-layer LSTM, input_size=1 scalar vocab index, Linear head over the
last hidden state) and ``analyzer/modern/deeplog/deeplog.py:500-537``
(predict: argsort logits descending, anomaly iff the observed next
event's rank >= topk).

torch is not in this image, so the LSTM forward pass is a standalone
numpy implementation of the identical math (torch gate order
i,f,g,o; sigmoid/tanh activations; zero initial h/c — models.py:58-60).
Weights are deterministic synthesized tensors (``make_weights``);
loading a reference ``.pt`` checkpoint is gated behind a torch import
(``load_torch_weights``) and raises cleanly when torch is absent.
Parity with a scalar per-sequence Python loop is pytest-asserted
(tests/test_operators.py::test_deeplog_kernel_parity), mirroring the
M5 recover-loop oracle pattern.

Scale shape: the vocab dim is bounded (= template library, ≤ a few
thousand), so event-id → index mapping is a JVM-side broadcast map
literal — no shuffle, no Python. The weight dict (layers × 4H·(H+1)
floats) is a Spark broadcast unpacked once per executor by a
scalar-iterator pandas UDF; each Arrow batch is scored with a handful
of (B,H) matmuls. No per-row Python anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def make_weights(
    num_classes: int,
    hidden: int = 16,
    layers: int = 2,
    seed: int = 7,
) -> dict[str, np.ndarray]:
    """Deterministic synthesized LSTM+Linear weights, torch layout.

    Per layer l: W_ih_l (4H × in), W_hh_l (4H × H), b_ih_l, b_hh_l —
    gates packed [input, forget, cell, output] as torch packs them.
    Head: W_out (C × H), b_out (C). Scaled down (×0.4) so tanh/sigmoid
    stay out of saturation and ranks are informative on synthetic data.
    """
    rng = np.random.default_rng(seed)
    w: dict[str, np.ndarray] = {"layers": np.array([layers]), "hidden": np.array([hidden])}
    in_size = 1
    for layer in range(layers):
        w[f"W_ih_{layer}"] = rng.standard_normal((4 * hidden, in_size)) * 0.4
        w[f"W_hh_{layer}"] = rng.standard_normal((4 * hidden, hidden)) * 0.4
        w[f"b_ih_{layer}"] = rng.standard_normal(4 * hidden) * 0.1
        w[f"b_hh_{layer}"] = rng.standard_normal(4 * hidden) * 0.1
        in_size = hidden
    w["W_out"] = rng.standard_normal((num_classes, hidden)) * 0.4
    w["b_out"] = rng.standard_normal(num_classes) * 0.1
    return w


def load_torch_weights(path: str) -> dict[str, np.ndarray]:
    """Load a reference DeepLog ``.pt`` checkpoint (e.g.
    data/persist/ftp/deeplog_exec_model_0.pt) into the numpy layout.

    Gated: torch is not installed in this image.
    """
    try:
        import torch  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "torch not available in this image; use make_weights() — "
            "the numpy kernel implements the identical forward math"
        ) from exc
    state = torch.load(path, map_location="cpu")  # pragma: no cover
    out: dict[str, np.ndarray] = {}  # pragma: no cover
    for k, v in state.items():  # pragma: no cover
        out[k] = v.numpy().astype(np.float64)
    return out  # pragma: no cover


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def lstm_logits(X: np.ndarray, w: dict[str, np.ndarray]) -> np.ndarray:
    """Batched LSTM forward: X (B, T) of vocab indices → logits (B, C).

    Identical math to DeepLogExec.forward (models.py:40-63): scalar
    input per step, stacked layers, Linear over the last time step's
    top-layer hidden state. Vectorized over the batch — T is the DeepLog
    window (5/10), so the loop runs T·layers steps of (B,·) matmuls.
    """
    layers = int(w["layers"][0])
    hidden = int(w["hidden"][0])
    B, T = X.shape
    inputs = X.astype(np.float64)[:, :, None]  # (B, T, 1)
    for layer in range(layers):
        W_ih, W_hh = w[f"W_ih_{layer}"], w[f"W_hh_{layer}"]
        b = w[f"b_ih_{layer}"] + w[f"b_hh_{layer}"]
        h = np.zeros((B, hidden))
        c = np.zeros((B, hidden))
        outs = np.empty((B, T, hidden))
        for t in range(T):
            gates = inputs[:, t, :] @ W_ih.T + h @ W_hh.T + b
            i = _sigmoid(gates[:, :hidden])
            f = _sigmoid(gates[:, hidden : 2 * hidden])
            g = np.tanh(gates[:, 2 * hidden : 3 * hidden])
            o = _sigmoid(gates[:, 3 * hidden :])
            c = f * c + i * g
            h = o * np.tanh(c)
            outs[:, t, :] = h
        inputs = outs
    return h @ w["W_out"].T + w["b_out"]


def target_rank(X: np.ndarray, targets: np.ndarray, w: dict[str, np.ndarray]) -> np.ndarray:
    """Rank (0-based) of each observed next-event among logits sorted
    descending — deeplog.py:510,526 ``argsort(output,1,True)`` then
    ``.index(target)``."""
    logits = lstm_logits(X, w)
    order = np.argsort(-logits, axis=1, kind="stable")
    return (order == targets[:, None]).argmax(axis=1)


def _vocab_map_expr(vocab_rows: list[tuple[str, int]], unknown_idx: int):
    """JVM map literal event_id → vocab_idx (bounded dim, F5) with the
    reserved unknown slot (deeplog.py:170)."""
    pairs: list = []
    for eid, idx in vocab_rows:
        pairs.append(F.lit(eid))
        pairs.append(F.lit(idx))
    m = F.create_map(*pairs)
    return m, unknown_idx


def score_sequences(
    spark: SparkSession,
    seq_df: DataFrame,
    vocab_rows: list[tuple[str, int]],
    weights: dict[str, np.ndarray] | None = None,
    topk: int = 10,
    seq_col: str = "seq",
    target_col: str = "target",
) -> DataFrame:
    """DeepLog exec-path scoring over ``sequence_windows`` output.

    Adds ``rank`` (position of the observed next event in the model's
    descending-logit order) and ``anomaly`` (rank >= topk,
    deeplog.py:527-529). Event-id → index mapping happens JVM-side via
    a broadcast map literal; only the LSTM matmul is Python, Arrow-
    batched, weights broadcast once per executor.
    """
    num_classes = max(i for _, i in vocab_rows) + 1
    if weights is None:
        weights = make_weights(num_classes)
    unknown = num_classes - 1
    vmap, _ = _vocab_map_expr(vocab_rows, unknown)

    df = seq_df.withColumn(
        "seq_idx",
        F.transform(F.col(seq_col), lambda e: F.coalesce(vmap[e], F.lit(unknown))),
    ).withColumn(
        "target_idx", F.coalesce(vmap[F.col(target_col)], F.lit(unknown))
    )

    bc = spark.sparkContext.broadcast(weights)

    @pandas_udf("int")
    def rank_udf(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        w = bc.value  # unpacked once per task
        for seqs, tgts in it:
            if len(seqs) == 0:
                yield pd.Series([], dtype="int32")
                continue
            X = np.asarray([np.asarray(s) for s in seqs], dtype=np.float64)
            r = target_rank(X, tgts.to_numpy(dtype=np.int64), w)
            yield pd.Series(r, dtype="int32")

    return df.withColumn("rank", rank_udf("seq_idx", "target_idx")).withColumn(
        "anomaly", (F.col("rank") >= F.lit(topk)).cast("int")
    )
