"""Task-2 recognition contract: CTC greedy decode as Catalyst algebra.

The reference *declares* task 2 (CRNN/CTC line recognition) but never
implements it (README.md:300 TODO); its task-3 stage consumes the
task-2 OCR outputs. This module supplies the Spark-native contract so a
trained CRNN drops in: per line, a (T × |vocab|+1) logit matrix column
→ greedy CTC decode (argmax per timestep → collapse repeats → drop
blanks → map to vocab chars). Decoding is pure array algebra; the
model forward that produces logits belongs in an Arrow-batched
``mapInPandas`` exactly like operators/model_udf.py.

Blank id = 0; vocab index i maps to VOCAB[i-1] (consistent with the
1-based char encoding of operators/encode.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..constants import VOCAB


def argmax_expr(scores: Column) -> Column:
    """Index of the max element of a double array (first max wins)."""
    n = F.size(scores)
    return F.aggregate(
        F.sequence(F.lit(1), n - 1),
        F.lit(0),
        lambda best, i: F.when(
            F.element_at(scores, i + 1) > F.element_at(scores, best + 1), i
        ).otherwise(best),
    )


def ctc_greedy_decode(logits: Column, vocab: str = VOCAB) -> Column:
    """array<array<double>> (time-major logits) → decoded string."""
    path = F.transform(logits, lambda frame: argmax_expr(frame))
    n = F.size(path)
    keep_idx = F.filter(
        F.sequence(F.lit(0), n - 1),
        lambda i: (i == 0)
        | (F.element_at(path, i + 1) != F.element_at(path, i)),
    )
    collapsed = F.transform(keep_idx, lambda i: F.element_at(path, i + 1))
    non_blank = F.filter(collapsed, lambda c: c != 0)
    vocab_chars = F.split(F.lit(vocab), "")
    chars = F.transform(
        non_blank, lambda c: F.element_at(vocab_chars, c.cast("int"))
    )
    return F.array_join(chars, "")
