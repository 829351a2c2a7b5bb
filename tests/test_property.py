"""Property-based tests (hypothesis) for the pure kernels: vectorized
reassembly vs a literal loop-per-key reference, and the hot-sink
hierarchical gate vs whole-key gating.  No Ray needed — these are the
numpy/Arrow kernels every distributed path reduces to."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from log_aggregator_ray.pipelines.flagship import combine_gate
from log_aggregator_ray.stages.reassemble import reassemble_table


# one sink's delivered turns: 1-based, with duplicates, gaps and shuffling
turns_strategy = st.lists(
    st.integers(min_value=1, max_value=60), min_size=1, max_size=120
)


def _reference_gate(turns: list[int]):
    """Literal reference: sort, dedup, accept contiguous from the minimum,
    report the first missing turn (reference accept rule,
    DataPumpDecoderSort.java:142-181)."""
    u = sorted(set(turns))
    routed = [u[0]]
    for t in u[1:]:
        if t == routed[-1] + 1:
            routed.append(t)
        else:
            break
    first_missing = routed[-1] + 1 if len(routed) < len(u) else None
    return routed, first_missing


@settings(max_examples=200, deadline=None)
@given(st.dictionaries(st.sampled_from("abcdef"), turns_strategy,
                       min_size=1, max_size=6))
def test_reassemble_kernel_matches_reference(per_sink):
    rows = [(s, t) for s, ts in per_sink.items() for t in ts]
    rng = np.random.default_rng(0)
    order = rng.permutation(len(rows))
    tbl = pa.table({
        "sink": pa.array([rows[i][0] for i in order]),
        "conv_id": pa.array([rows[i][0] for i in order]),
        "turn_idx": pa.array([rows[i][1] for i in order], pa.int64()),
        "text": pa.array([f"x{rows[i][1]}" for i in order]),
    })
    out = reassemble_table(tbl)
    df = out.to_pandas()

    total_dups = int(df["dup_dropped"].sum())
    n_unique = sum(len(set(ts)) for ts in per_sink.values())
    assert total_dups == len(rows) - n_unique
    assert len(df) == n_unique

    for sink, ts in per_sink.items():
        exp_routed, exp_fm = _reference_gate(ts)
        g = df[df["sink"] == sink]
        got_routed = g[g["status"] == "routed"]["turn_idx"].tolist()
        assert got_routed == exp_routed, sink
        quar = g[g["status"] == "quarantined"]
        if exp_fm is None:
            assert len(quar) == 0
        else:
            assert set(quar["first_missing_turn"]) == {exp_fm}
            assert sorted(quar["turn_idx"]) == sorted(
                t for t in set(ts) if t not in exp_routed
            )


@settings(max_examples=300, deadline=None)
@given(turns_strategy, st.integers(min_value=2, max_value=16))
def test_hierarchical_gate_matches_whole_key(turns, block):
    """Splitting a key's turns into turn-range blocks and combining the
    per-block (mn, mx, first internal gap) summaries yields exactly the
    whole-key first-missing turn."""
    u = np.array(sorted(set(turns)), dtype=np.int64)
    _routed, exp_fm = _reference_gate(turns)

    infos = []
    for b in sorted(set(u // block)):
        seg = u[u // block == b]
        gaps = np.flatnonzero(np.diff(seg) != 1)
        infos.append({
            "mn": int(seg[0]),
            "mx": int(seg[-1]),
            "first_missing": int(seg[gaps[0]] + 1) if gaps.size else None,
        })
    assert combine_gate(infos) == exp_fm


@settings(max_examples=100, deadline=None)
@given(st.sets(st.text(min_size=1, max_size=20), min_size=0, max_size=200))
def test_sink_bloom_never_false_negative(sinks):
    """Append-merge safety rests on the bloom having NO false negatives:
    a member reported absent would let an overlapping merge take the
    append path and mis-gate a sink.  (False positives only cost an
    exact re-check.)"""
    from log_aggregator_ray.state.manifest import bloom_any_maybe, sink_bloom

    b = sink_bloom(sorted(sinks))
    for s in sinks:
        assert bloom_any_maybe(b, [s])
    if sinks:
        assert bloom_any_maybe(b, sorted(sinks))
    assert sink_bloom(sorted(sinks)) == b  # deterministic across processes


# ---------------------------------------------------------------------------
# round-5 kernels: repetition metrics + BPE counting vs literal references
# ---------------------------------------------------------------------------

_word_st = st.text(alphabet="abcz01", min_size=0, max_size=6)
_doc_st = st.lists(_word_st, min_size=0, max_size=30).map(" ".join)
_mldoc_st = st.lists(_doc_st, min_size=1, max_size=4).map("\n".join)


def _ref_rep_metrics(text: str, ngrams=(2, 3, 4)):
    """Literal per-doc reference for rep_stats_table: Counter-based."""
    import re
    from collections import Counter

    total = max(len(text), 1)
    lines = text.split("\n")
    lc = Counter(lines)
    rep = sum(c - 1 for c in lc.values())
    repch = sum((c - 1) * len(line) for line, c in lc.items())
    out = {
        "dup_line_frac": rep / len(lines),
        "dup_line_char_frac": repch / total,
    }
    toks = [w for w in re.split("[^a-z0-9]+", text.lower()) if w]
    for n in ngrams:
        grams = Counter(
            " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
        )
        cov = max((c * len(g) for g, c in grams.items()), default=0)
        out[f"top_{n}gram_char_frac"] = min(cov / total, 1.0)
    return out


@settings(max_examples=150, deadline=None)
@given(st.lists(_mldoc_st, min_size=1, max_size=5))
def test_rep_stats_kernel_matches_reference(texts):
    from log_aggregator_ray.functions.textstats import rep_stats_table

    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    got = rep_stats_table(t).to_pandas().set_index("doc_id")
    for i, text in enumerate(texts):
        exp = _ref_rep_metrics(text)
        for k, v in exp.items():
            assert abs(got.loc[i, k] - v) < 1e-12, (text, k, got.loc[i, k], v)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet="abcdeghilmnorstuwz", min_size=1,
                        max_size=12), min_size=0, max_size=15))
def test_bpe_counter_matches_reference_loop(words):
    from log_aggregator_ray.functions.bpe import BPETokenCounter, load_merges

    ranks = load_merges()

    def ref_count(word):
        sym = list(word)
        while len(sym) > 1:
            cand = [(ranks[(a, b)], i) for i, (a, b) in
                    enumerate(zip(sym, sym[1:])) if (a, b) in ranks]
            if not cand:
                break
            _, i = min(cand)
            a, b = sym[i], sym[i + 1]
            out, j = [], 0
            while j < len(sym):
                if j + 1 < len(sym) and sym[j] == a and sym[j + 1] == b:
                    out.append(a + b); j += 2
                else:
                    out.append(sym[j]); j += 1
            sym = out
        return len(sym)

    text = " ".join(words)
    c = BPETokenCounter()
    got = c(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array([text]),
    })).to_pandas()
    assert got.loc[0, "tokens"] == sum(ref_count(w) for w in words)


_pii_frag = st.sampled_from([
    "plain words here", "x@y.co", "a.b+c@d-e.org", "10.0.3.200",
    "999.1.1.1", "123-45-6789", "415-555-1234", "12-34-5678",
    "1234-555-1234", "", "dot.end.", "@nope",
])


@settings(max_examples=150, deadline=None)
@given(st.lists(_pii_frag, min_size=0, max_size=8))
def test_pii_scrub_matches_sequential_re(frags):
    """pii_redact's vectorized count-then-replace vs Python re applied
    in the same class order over the same evolving text."""
    import re

    from log_aggregator_ray.functions.corpus import PII_PATTERNS

    text = " ".join(frags)
    # reference: sequential count + replace per class
    cur, exp_counts = text, {}
    for name, pat, tok in PII_PATTERNS:
        exp_counts[f"n_{name}"] = len(re.findall(pat, cur))
        cur = re.sub(pat, tok, cur)

    from log_aggregator_ray.functions import corpus as corpus_mod

    # drive the kernel directly through the op's scrub closure by
    # building a one-row dataset-free call: reuse pii patterns through a
    # tiny table + the module's map function via pii_redact on from_items
    # would need Ray; instead replicate the kernel inline
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array([text])})
    import pyarrow.compute as pc
    s = t["text"]
    got = {}
    for name, pat, tok in PII_PATTERNS:
        got[f"n_{name}"] = int(pc.count_substring_regex(s, pat)[0].as_py())
        s = pc.replace_substring_regex(s, pat, tok)
    assert got == exp_counts, text
    assert s[0].as_py() == cur


_tok = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"])


@settings(max_examples=120, deadline=None)
@given(st.lists(st.lists(_tok, min_size=0, max_size=14).map(" ".join),
                min_size=1, max_size=5),
       st.lists(st.lists(_tok, min_size=3, max_size=6).map(" ".join),
                min_size=0, max_size=3))
def test_decontaminate_ngrams_matches_reference(texts, snippets):
    """Vectorized gram-hash membership vs a literal set-of-ngrams
    reference (n=3 so short random docs can actually collide)."""
    import re

    from log_aggregator_ray.functions.corpus import TOKEN_SPLIT_PATTERN

    n = 3
    split = re.compile(TOKEN_SPLIT_PATTERN)

    def grams(s):
        toks = [w for w in split.split(s.lower()) if w]
        return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]

    eval_set = {g for s in snippets for g in grams(s)}
    exp = [sum(g in eval_set for g in grams(t)) for t in texts]

    # drive the batch kernel without Ray via a single-batch call path:
    # decontaminate_ngrams builds its flag() closure over broadcast
    # hashes; replicate by running the op on a Ray dataset is covered in
    # test_corpus — here check the hash-membership arithmetic directly
    from log_aggregator_ray.stages.route import stable_hash

    eh = (np.unique(stable_hash(pa.array(sorted(eval_set))))
          if eval_set else np.array([], np.uint64))
    got = []
    for t in texts:
        gs = grams(t)
        if gs:
            h = stable_hash(pa.array(gs))
            got.append(int(np.isin(h, eh).sum()))
        else:
            got.append(0)
    assert got == exp
