#!/usr/bin/env python
"""Learn the small frozen BPE merge list shipped as
log_aggregator_ray/fixtures/bpe_merges.txt (VERDICT r4 #9).

Standard byte-pair-merge learning (Sennrich et al. ACL'16) over the
sf0.01 documents vocabulary, frequency-weighted, 160 merges.  Run once;
the OUTPUT file is the frozen fixture — reruns are deterministic.
"""
import collections
import os
import sys

import duckdb

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "log_aggregator_ray", "fixtures", "bpe_merges.txt")
N_MERGES = 160

con = duckdb.connect()
vocab = con.execute("""
    WITH toks AS (
      SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS tok
      FROM read_parquet('/root/testdata/sf0.01/documents.parquet'))
    SELECT tok, count(*) AS n FROM toks WHERE tok <> ''
    GROUP BY tok ORDER BY n DESC, tok
""").fetchall()

words = {tuple(w): int(n) for w, n in vocab}
merges = []
for _ in range(N_MERGES):
    pairs = collections.Counter()
    for sym, n in words.items():
        for a, b in zip(sym, sym[1:]):
            pairs[(a, b)] += n
    if not pairs:
        break
    # deterministic tie-break: highest count, then lexicographic
    (a, b), cnt = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    if cnt < 2:
        break
    merges.append((a, b))
    new = {}
    for sym, n in words.items():
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b); i += 2
            else:
                out.append(sym[i]); i += 1
        new[tuple(out)] = new.get(tuple(out), 0) + n
    words = new

with open(OUT, "w") as fh:
    fh.write("# frozen BPE merges (tools/make_bpe_merges.py)\n")
    for a, b in merges:
        fh.write(f"{a} {b}\n")
print(f"{len(merges)} merges -> {OUT}")
print("sample:", merges[:10])
