"""huggingface-embedding analog: windowing / de-overlap / pooling /
micro-batching semantics pinned against the reference formulas
(/root/reference/edspdf/pipes/embeddings/huggingface_embedding.py),
plus Spark==kernel parity."""

import numpy as np
import pytest

from edspdf_spark.kernels.hf import (CLS_ID, EMB_MOD, EMB_MUL, POS_STEP,
                                     SEP_ID, WIN_STEP, attention_weights,
                                     choose_occurrences, hf_page_embed,
                                     subword_pieces, token_embedding,
                                     token_id, tokenize_line, window_rows)


# ---------------------------------------------------------------------------
# windowing (reference :220-228)
# ---------------------------------------------------------------------------

def test_window_rows_single_window_when_short():
    # L-2 <= window -> exactly one window covering everything
    assert window_rows(6, window=4, stride=2) == [[0, 1, 2, 3, 4, 5]]
    assert window_rows(2, window=4, stride=2) == [[0, 1]]  # empty page


def test_window_rows_strided_overlap():
    # L=7 (5 body tokens), window=4, stride=2:
    # ceil((5-4)/2)=1 -> 2 windows; CLS/SEP bracket every window
    rows = window_rows(7, window=4, stride=2)
    assert rows == [[0, 1, 2, 3, 4, 6], [0, 3, 4, 5, 6]]
    # every body token covered
    covered = {g for r in rows for g in r}
    assert covered == set(range(7))


def test_window_rows_window_count_formula():
    # reference: 1 + max(0, ceil((L - 2 - window) / stride))
    import math
    for length, window, stride in [(512, 510, 255), (513, 510, 255),
                                   (1024, 510, 255), (40, 8, 4),
                                   (41, 8, 4)]:
        n = 1 + max(0, math.ceil((length - 2 - window) / stride))
        assert len(window_rows(length, window, stride)) == n


# ---------------------------------------------------------------------------
# de-overlap (reference :20-27, :245-259)
# ---------------------------------------------------------------------------

def test_choose_occurrences_most_contextualized_wins():
    rows = [[0, 1, 2, 3, 4, 6], [0, 3, 4, 5, 6]]
    chosen = choose_occurrences(rows)
    # token 3: scores 2 (wi0,j3) vs 1 (wi1,j1) -> wi0
    assert chosen[3] == (0, 3)
    # token 4: scores 1 (wi0,j4) vs 2 (wi1,j2) -> wi1
    assert chosen[4] == (1, 2)
    # SEP 6: score 0 in both -> tie broken toward larger flat index
    assert chosen[6] == (1, 4)
    # CLS 0: score 0 everywhere -> last window
    assert chosen[0] == (1, 0)


def test_choose_occurrences_matches_reference_amax_trick():
    """Direct emulation of the reference's score*len+index amax."""
    rows = window_rows(30, window=8, stride=4)
    width = max(map(len, rows))
    n = len(rows) * width
    best_val = {}
    for wi, row in enumerate(rows):
        m = len(row)
        for j, g in enumerate(row):
            score = max(0, min(j, m - 1 - j))
            lex = score * n + (wi * width + j)
            if g not in best_val or lex > best_val[g][0]:
                best_val[g] = (lex, (wi, j))
    expect = {g: occ for g, (_v, occ) in best_val.items()}
    assert choose_occurrences(rows) == expect


# ---------------------------------------------------------------------------
# tokenizer + frozen embedding table
# ---------------------------------------------------------------------------

def test_subword_pieces_and_tokenize():
    assert subword_pieces("internationalization") == \
        ["inte", "rnat", "iona", "liza", "tion"]
    assert tokenize_line("a  bb cccc ddddd") == ["a", "bb", "cccc",
                                                 "dddd", "d"]
    assert tokenize_line("") == []


def test_token_embedding_closed_form():
    tid = token_id("spark")
    e = token_embedding(tid, 4)
    for d in range(4):
        assert e[d] == (tid + d * EMB_MUL) % EMB_MOD - EMB_MOD // 2
    assert e.dtype == np.int64


# ---------------------------------------------------------------------------
# page embedding end-to-end
# ---------------------------------------------------------------------------

PAGE = ["alpha beta gamma", "delta epsilon", "zeta eta theta iota"]


def test_sep_pooled_into_last_line():
    """Reference :275-277: the last line's range extends to L, so the
    SEP embedding rides its pool — verified by recomputing the last
    line by hand."""
    out = hf_page_embed(PAGE, dim=4, window=6, stride=3, pooling="sum")
    # rebuild the token stream
    toks = [CLS_ID]
    starts = []
    for t in PAGE:
        starts.append(len(toks))
        toks.extend(token_id(p) for p in tokenize_line(t))
    toks.append(SEP_ID)
    length = len(toks)
    rows = window_rows(length, 6, 3)
    chosen = choose_occurrences(rows)

    def ctx(g):
        wi, j = chosen[g]
        return (token_embedding(toks[g], 4)
                + j * POS_STEP + wi * WIN_STEP)

    last = sum(ctx(g) for g in range(starts[2], length))  # includes SEP
    assert np.array_equal(out[2], last.astype(np.float64))
    without_sep = sum(ctx(g) for g in range(starts[2], length - 1))
    assert not np.array_equal(out[2], without_sep.astype(np.float64))


def test_pooling_modes_consistent():
    s = hf_page_embed(PAGE, dim=4, window=6, stride=3, pooling="sum")
    m = hf_page_embed(PAGE, dim=4, window=6, stride=3, pooling="mean")
    x = hf_page_embed(PAGE, dim=4, window=6, stride=3, pooling="max")
    counts = [len(tokenize_line(t)) for t in PAGE]
    counts[-1] += 1  # SEP rides the last line
    for li, c in enumerate(counts):
        assert np.allclose(m[li], s[li] / c)
    assert (x >= m - 1e-9).all()
    with pytest.raises(ValueError, match="line_pooling"):
        hf_page_embed(PAGE, pooling="median")


def test_micro_batching_does_not_change_results():
    """max_tokens_per_device bounds memory, never values
    (reference :113-116, :344-363)."""
    for ctxr in ("affine", "attention"):
        w = attention_weights(4) if ctxr == "attention" else None
        full = hf_page_embed(PAGE, dim=4, window=6, stride=3,
                             contextualizer=ctxr, weights=w)
        tiny = hf_page_embed(PAGE, dim=4, window=6, stride=3,
                             contextualizer=ctxr, weights=w,
                             max_tokens_per_device=8)
        assert np.array_equal(full, tiny)


def test_single_vs_multi_window_differ_only_by_context():
    """A page short enough for one window must equal the trivial
    single-window computation; forcing multiple windows changes ctx
    values (de-overlap becomes observable)."""
    one = hf_page_embed(PAGE, dim=4, window=100, stride=50)
    again = hf_page_embed(PAGE, dim=4, window=100, stride=50)
    assert np.array_equal(one, again)  # deterministic
    multi = hf_page_embed(PAGE, dim=4, window=6, stride=3)
    assert not np.array_equal(one, multi)


def test_empty_inputs():
    assert hf_page_embed([], dim=4).shape == (0, 4)
    out = hf_page_embed(["", "alpha"], dim=4, pooling="mean")
    assert np.array_equal(out[0], np.zeros(4))  # empty bag -> zeros
    assert not np.array_equal(out[1], np.zeros(4))


def test_attention_contextualizer_deterministic_and_real():
    w = attention_weights(4)
    a = hf_page_embed(PAGE, dim=4, window=6, stride=3,
                      contextualizer="attention", weights=w)
    b = hf_page_embed(PAGE, dim=4, window=6, stride=3,
                      contextualizer="attention", weights=w)
    assert np.array_equal(a, b)
    aff = hf_page_embed(PAGE, dim=4, window=6, stride=3)
    assert not np.allclose(a, aff)
    with pytest.raises(ValueError, match="contextualizer"):
        hf_page_embed(PAGE, dim=4, contextualizer="bert")


# ---------------------------------------------------------------------------
# Spark parity
# ---------------------------------------------------------------------------

def test_spark_matches_kernel(spark):
    from edspdf_spark import synth
    from edspdf_spark.operators import blocs, extract
    from edspdf_spark.operators.hf_embedding import hf_line_embed

    pages = synth.pages_spark(spark, 12, num_partitions=3)
    bl = blocs(extract(pages))
    got = {(r["url"], r["page_num"], r["order_idx"]):
           [r[f"h{c}"] for c in range(4)]
           for r in hf_line_embed(bl, dim=4, window=24,
                                  stride=12).collect()}

    rows = bl.select("url", "page_num", "order_idx", "text").collect()
    by_page = {}
    for r in rows:
        by_page.setdefault((r["url"], r["page_num"]), []).append(
            (r["order_idx"], r["text"]))
    n_checked = 0
    for (url, p), lines in by_page.items():
        lines.sort()
        embs = hf_page_embed([t for _, t in lines], dim=4, window=24,
                             stride=12)
        for (oi, _t), e in zip(lines, embs):
            assert got[(url, p, oi)] == [float(v) for v in e]
            n_checked += 1
    assert n_checked == len(got) and n_checked > 50


def test_spark_plan_shape(spark):
    """One shuffle (url repartition) + one Python stage, no EvalPython."""
    from edspdf_spark import synth
    from edspdf_spark.operators import blocs, extract
    from edspdf_spark.operators.hf_embedding import hf_line_embed

    df = hf_line_embed(blocs(extract(synth.pages_spark(spark, 4))), dim=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert plan.count("Exchange") == 1, plan
