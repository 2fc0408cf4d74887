"""Property tests for the round-3-close operators: random inputs vs
independent pure-Python models (the test_property_curation pattern —
few examples, each a full Spark plan, deadline off).
"""

from hypothesis import given, settings
from hypothesis import strategies as st

UNIT = 10**9

# small random claim tables: a handful of sources / slots / objects
claims_strat = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),   # source
        st.integers(min_value=0, max_value=3),   # subj
        st.integers(min_value=0, max_value=2),   # obj
    ),
    min_size=1,
    max_size=25,
)


def _py_fuse(rows, iters=2, sr=9):
    claims = sorted({(f"s{s}", f"A{a}", "p", f"O{o}") for s, a, o in rows})
    floor = 10.0**-sr
    trust = {c[0]: round(0.5, sr) for c in claims}
    conf = {}
    for _ in range(iters):
        sup, nsrc = {}, {}
        for src, subj, pred, obj in claims:
            k = (subj, pred, obj)
            sup[k] = sup.get(k, 0.0) + trust[src]
            nsrc[k] = nsrc.get(k, 0) + 1
        sup = {k: round(v, sr) for k, v in sup.items()}
        mass = {}
        for (subj, pred, obj), v in sup.items():
            mass[(subj, pred)] = mass.get((subj, pred), 0.0) + v
        mass = {k: round(v, sr) for k, v in mass.items()}
        conf = {
            k: round(v / mass[(k[0], k[1])], sr) for k, v in sup.items()
        }
        tsum, tcnt = {}, {}
        for src, subj, pred, obj in claims:
            tsum[src] = tsum.get(src, 0.0) + conf[(subj, pred, obj)]
            tcnt[src] = tcnt.get(src, 0) + 1
        trust = {
            s: max(round(tsum[s] / tcnt[s], sr), floor) for s in tsum
        }
    best = {}
    for (subj, pred, obj), c in conf.items():
        cur = best.get((subj, pred))
        if cur is None or (-c, obj) < cur:
            best[(subj, pred)] = (-c, obj)
    return {
        k: (v, nsrc[k], best[(k[0], k[1])][1] == k[2]) for k, v in conf.items()
    }, nsrc


@settings(max_examples=6, deadline=None)
@given(claims_strat)
def test_fuse_claims_matches_python_model(spark, rows):
    from easyner_spark.operators.triples import fuse_claims

    df = spark.createDataFrame(
        [(f"s{s}", f"A{a}", "p", f"O{o}") for s, a, o in rows],
        "source string, subj_id string, pred string, obj_id string",
    )
    got = {
        (r.subj_id, r.pred, r.obj_id): (r.confidence, r.n_sources, r.is_best)
        for r in fuse_claims(df, iters=2).collect()
    }
    want_conf, want_n = _py_fuse(rows)
    assert set(got) == set(want_conf)
    # Python round() is HALF_EVEN, Spark's is HALF_UP: on a rounding
    # boundary the states differ by one 1e-9 grid step and compound
    # over 2 iterations — the model is a semantic check, not bit-parity
    # (bit-parity is the DuckDB oracle's job), so allow a few steps.
    slot_conf = {}
    for k, (c, n, b) in want_conf.items():
        gc, gn, gb = got[k]
        assert gn == want_n[k]
        assert abs(gc - c) <= 5e-9
        slot_conf.setdefault((k[0], k[1]), []).append(c)
    for k, (c, n, b) in want_conf.items():
        top2 = sorted(slot_conf[(k[0], k[1])], reverse=True)[:2]
        margin = top2[0] - top2[1] if len(top2) > 1 else 1.0
        if margin > 2e-8:  # clear winner: engines must agree on it
            assert got[k][2] == b


sent_strat = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
        min_size=1,
        max_size=4,
    ),
    min_size=1,
    max_size=6,
)


def _py_textrank(sents, iters=3):
    toks = [set(s) for s in sents]
    n = len(sents)
    edges = {}
    for i in range(n):
        for j in range(n):
            if i != j:
                w = len(toks[i] & toks[j])
                if w:
                    edges[(i, j)] = w
    wsum = {}
    for (j, _), w in edges.items():
        wsum[j] = wsum.get(j, 0) + w
    s = [UNIT] * n
    for _ in range(iters):
        inc = [0] * n
        for (j, i), w in edges.items():
            inc[i] += (s[j] * w) // wsum[j]
        s = [(3 * UNIT) // 20 + (17 * v) // 20 for v in inc]
    return s


@settings(max_examples=6, deadline=None)
@given(sent_strat)
def test_textrank_matches_python_model(spark, sents):
    from easyner_spark.operators.ranking import textrank_sentences

    df = spark.createDataFrame(
        [("d", i, " ".join(s)) for i, s in enumerate(sents)],
        "url string, sent_idx int, sentence string",
    )
    got = {r.sent_idx: r.score for r in textrank_sentences(df, iters=3).collect()}
    want = _py_textrank(sents)
    assert got == {i: v / float(UNIT) for i, v in enumerate(want)}


pair_strat = st.lists(
    st.tuples(st.booleans(), st.booleans()),
    min_size=2,
    max_size=40,
)


@settings(max_examples=6, deadline=None)
@given(pair_strat)
def test_fs_em_probability_is_pattern_function(spark, agreements):
    from easyner_spark.operators.nel import fs_em_linkage

    df = spark.createDataFrame(
        [(i, i + 1000, a, b) for i, (a, b) in enumerate(agreements)],
        "id_a int, id_b int, f1 boolean, f2 boolean",
    )
    out = fs_em_linkage(df, ("f1", "f2"), iters=3).collect()
    assert len(out) == len(agreements)
    probs = {}
    for r in out:
        pat = agreements[r.id_a]
        probs.setdefault(pat, set()).add(r.match_prob)
    # one probability per pattern; valid probability range (the
    # param clamp keeps m/u/p interior, but an extreme pattern's
    # posterior may legitimately round to 0 or 1)
    for ps in probs.values():
        assert len(ps) == 1
        (p,) = ps
        assert 0.0 <= p <= 1.0
