"""Property-based test: weighted TextRank vs an independent Python
implementation of the same quantized recurrence (round-14 extension).

The operator's determinism contract is that every round's contribution
sums are 1e-6 fixed-point bigints over 6dp-quantized state, so results
are bit-reproducible across partitionings and engines. The model
replicates that arithmetic exactly — per-term HALF_UP rounding on the
shortest-decimal representation (BigDecimal.valueOf semantics, which is
what Catalyst's round() on doubles uses), fixed-point summation, then
the 6dp state quantization — on random symmetric weighted graphs. A
model using plain float arithmetic diverges in the 6th decimal within a
few rounds; matching exactly is the point.
"""

from __future__ import annotations

from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

_pairs = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 5), st.integers(1, 9))
    .filter(lambda t: t[0] != t[1]),
    min_size=1, max_size=10,
    unique_by=lambda t: (min(t[0], t[1]), max(t[0], t[1])),
)

_DAMPING = 0.85
_N_ITER = 4


def _round_like_spark(v: float, digits: int = 0) -> float:
    # Catalyst round() on doubles goes through BigDecimal.valueOf —
    # shortest decimal representation — then HALF_UP; repr() is Python's
    # shortest-repr equivalent.
    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(v)).quantize(q, rounding=ROUND_HALF_UP))


@settings(max_examples=6, deadline=None, derandomize=True)
@given(pairs=_pairs)
def test_weighted_textrank_matches_quantized_model(spark, pairs):
    from hierarchical_graph_db_spark.operators.graph import weighted_textrank

    sym = []
    for a, b, w in pairs:
        sym.append((str(a), str(b), float(w)))
        sym.append((str(b), str(a), float(w)))
    df = spark.createDataFrame(sym, "src string, dst string, weight double")
    got = {r["id"]: r["score"]
           for r in weighted_textrank(df, n_iter=_N_ITER,
                                      damping=_DAMPING).collect()}

    outw = defaultdict(float)
    incoming = defaultdict(list)  # dst -> [(src, w)]
    for s, d, w in sym:
        outw[s] += w
        incoming[d].append((s, w))
    verts = sorted(outw)
    score = {v: 1.0 for v in verts}
    base = 1 - _DAMPING  # same float the operator's F.lit(1 - damping) uses
    for _ in range(_N_ITER):
        contrib = {}
        for v in verts:
            fp = sum(
                int(_round_like_spark(score[s] * w / outw[s] * 1000000))
                for s, w in incoming.get(v, ()))
            contrib[v] = fp / 1000000.0
        score = {
            v: _round_like_spark(base + _DAMPING * contrib.get(v, 0.0), 6)
            for v in verts
        }
    assert got == score
