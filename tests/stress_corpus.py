"""Adversarial stress corpus: the same ten tables as the driver's testdata,
derived deterministically from sf0.001, with the content the synthetic
fixture never exercises — apostrophes/unicode/empty text, value extremes,
filter-boundary equalities, timestamp ties, zero/duplicate vectors.

Purpose: the oracle gate compares a hand-written Spark query against a
hand-written DuckDB query; a divergence that both sides hide behind bland
fixture content (e.g. the round-4 apostrophe tokenization bug, green for
three rounds because no document contained an apostrophe) only surfaces
when the DATA disagrees. `tests/test_oracle_stress.py` replays the entire
oracle matrix against this corpus.

Everything here must stay inside the data model's contracts (no NULL keys,
no new enum values, n_chars == length(text)) — the point is hostile CONTENT,
not schema violations the operators are entitled to reject.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

BASE_SF = "/root/testdata/sf0.001"

# adversarial text: punctuation, apostrophes, unicode, whitespace shapes,
# repetition, case — every tokenization/normalization convention differs
# between engines on at least one of these if the two sides drifted
NASTY_TEXTS = [
    "",
    " ",
    "\t\n  \t",
    "don't stop believin' — it's O'Brien's job, isn't it?",
    "Can't won't shan't o'clock 'quoted' don''t",
    "CAFÉ naïve façade Zürich coöperate déjà vu",
    "数据库 查询 引擎 数据库 查询",
    "emoji 🎉 test 🚀 with 🎉 repeats",
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
    "1234567890 42 0 -17 3.14159 1e10",
    "!!! ??? ... ;;; --- ***",
    'mixed "double" and \'single\' and `back` quotes',
    "percent% under_score %like% _pattern_",
    "back\\slash c:\\path\\to\\file and regex chars .*+?[](){}|^$",
    "<p>html tags</p> <div class='x'>&amp; entities&nbsp;</div>",
    "Line one\nline two\r\nline three\rline four",
    "   leading and trailing spaces   ",
    "UPPER lower MiXeD Case WORDS upper LOWER",
    "word",
    "the the the the the the the the the the",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "hyphen-ated words re-use state-of-the-art one-off",
    "комната спутник словарь поиск",  # cyrillic
    "tab\tseparated\ttokens\there",
    "ends with apostrophe'",
    "'starts with apostrophe",
    "comma,separated,no,spaces and dot.separated.tokens",
    "price: $1,234.56 (25% off!) #hashtag @mention",
    ("long repeated segment " * 400).strip(),  # ~8.8k chars
    "short",
]


def _write(df: pd.DataFrame, base_path: str, out_path: str) -> None:
    """Write with the BASE table's arrow schema so parquet logical types
    (timestamp[us], int32, list<float>) match the driver's files exactly."""
    schema = pq.read_schema(base_path)
    pq.write_table(
        pa.Table.from_pandas(df, schema=schema, preserve_index=False), out_path
    )


def build_stress_dir(out_dir: str, base_sf: str = BASE_SF) -> str:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(7)

    def base(t):
        return pd.read_parquet(f"{base_sf}/{t}.parquet")

    # region / nation: dims, copied verbatim
    for t in ("region", "nation"):
        _write(base(t), f"{base_sf}/{t}.parquet", f"{out_dir}/{t}.parquet")

    # documents: overwrite a deterministic slice with the nasty texts (two
    # copies of each at distant doc_ids -> source-level exact duplicates),
    # recompute n_chars everywhere so the invariant holds
    d = base("documents").copy()
    n = len(d)
    for i, txt in enumerate(NASTY_TEXTS):
        d.loc[d.index[i * 3 % n], "text"] = txt
        d.loc[d.index[(i * 3 + 151) % n], "text"] = txt  # exact dup partner
    # near-dup partners: one token appended to an existing doc's text
    for i in range(0, n, 37):
        j = (i + 211) % n
        d.loc[d.index[j], "text"] = d["text"].iloc[i] + " extra"
    # fuzzy_doc_pairs samples doc_id % 20 == 0, length-bands the 48-char
    # prefix, and pairs each doc with its 2-char-mutated twin (positions 10
    # and 26 become ASCII). This prefix is engineered so base = 48 chars /
    # 52 bytes (band 13 under a bytes band) while the twin = 48 chars /
    # 50 bytes (band 12): a bytes-vs-chars band drift DROPS the (base, twin)
    # pair on one engine only — the divergence class of the round-5
    # strlen-band find, which the old corpus could not surface
    uni_prefix = "abcdéfghiüjklmnopqrstuvwxötuvàbcdefghijklmnopqrs"
    assert len(uni_prefix) == 48 and len(uni_prefix.encode()) == 52
    sampled = d.index[(d["doc_id"] % 20 == 0).to_numpy()][:4]
    for k, idx in enumerate(sampled):
        d.loc[idx, "text"] = uni_prefix + f" tail{k} " + str(d.loc[idx, "text"])
    d["n_chars"] = d["text"].str.len().astype("int64")
    _write(d, f"{base_sf}/documents.parquet", f"{out_dir}/documents.parquet")

    # events: value extremes, same-(user, ts) ties, edge-shaped props.
    # Magnitude contract: the exact-stat operators integer-scale values
    # (cents/1e-4 units) and sum the squares — |value| must stay small
    # enough that sum(v_scaled^2) fits int64 (~1e5 at these row counts).
    # 98765.43 is 300x the fixture max while honoring that envelope.
    e = base("events").copy()
    e.loc[e.index[0:4], "value"] = [0.0, -5.25, 98765.43, 1e-9]
    e.loc[e.index[10], "value"] = 0.005  # banker's-rounding half
    e.loc[e.index[11], "value"] = 2.675  # float-representation half (2.6749999...)
    # 20 tie rows: copy user_id+ts from a donor row (distinct event_id keeps
    # the key contract; window ORDER BY determinism must break ties itself)
    donors = e.index[rng.choice(len(e), 20, replace=False)]
    for k, idx in enumerate(donors):
        tgt = e.index[(idx * 7 + 13) % len(e)]
        if tgt == idx:
            continue
        e.loc[tgt, "user_id"] = e.loc[idx, "user_id"]
        e.loc[tgt, "ts"] = e.loc[idx, "ts"]
    edge_props = [
        "{}",
        "[]",
        "not json at all",
        "",
        '{"k": null}',
        '{"k": -1}',
        '{"nested": {"a": 1}}',
        '{"k": 999999999999}',
        '{"k": "string"}',
        '{"k": 3.5}',
        # string->int cast-grammar divergences: Spark's try_cast accepts
        # '+5' (DuckDB's regexp gate must too reject it via the shared
        # integer grammar), both engines' casts trim ' 7 ', and '7\n'
        # splits the ANCHORS themselves (Java $ matches before a trailing
        # newline, RE2 $ is end-of-text — the grammar must use \A..\z)
        '{"k": "+5"}',
        '{"k": " 7 "}',
        '{"k": "7\\n"}',
    ]
    for i, p in enumerate(edge_props):
        e.loc[e.index[i * 13 % len(e)], "props"] = p
    _write(e, f"{base_sf}/events.parquet", f"{out_dir}/events.parquet")

    # orders: price extremes + EXACT filter-boundary values (the CDC filter
    # matrix compares o_totalprice > 150000 / <= 100000 — equality rows
    # make off-by-one comparisons visible), date ties already abundant
    o = base("orders").copy()
    o.loc[o.index[0:6], "o_totalprice"] = [
        0.0,
        0.01,
        150000.0,  # boundary: > is false, >= would be true
        100000.0,  # boundary: <= is true, < would be false
        999999999.99,
        0.005,
    ]
    _write(o, f"{base_sf}/orders.parquet", f"{out_dir}/orders.parquet")

    # lineitem: quantity/discount/tax extremes (revenue terms hit exact 0)
    li = base("lineitem").copy()
    li.loc[li.index[0:4], "l_quantity"] = [0.0, 1.0, 50.0, 0.5]
    li.loc[li.index[0:4], "l_discount"] = [0.0, 1.0, 0.05, 0.10]
    li.loc[li.index[0:4], "l_tax"] = [0.0, 0.0, 0.08, 0.0]
    _write(li, f"{base_sf}/lineitem.parquet", f"{out_dir}/lineitem.parquet")

    # customer / supplier / part: hostile names, zero/negative balances.
    # Format contract: the record-linkage blocking derives keys from the
    # name's trailing digits ('Name#000123'), so hostility lives in the
    # PREFIX and every name keeps a digit suffix.
    c = base("customer").copy()
    nasty_names = [
        "O'Brien don't#000001",
        "Müller & Søn#000002",
        "数据库客户#000003",
        "name--; sql-ish#000004",
        "pct%under_score#000005",
        "  padded  #000006",
    ]
    for i, nm in enumerate(nasty_names):
        c.loc[c.index[i * 11 % len(c)], "c_name"] = nm
    c.loc[c.index[0:3], "c_acctbal"] = [0.0, -999.99, 9999999.99]
    _write(c, f"{base_sf}/customer.parquet", f"{out_dir}/customer.parquet")

    s = base("supplier").copy()
    for i, nm in enumerate(nasty_names[:4]):
        s.loc[s.index[i * 7 % len(s)], "s_name"] = nm
    s.loc[s.index[0:2], "s_acctbal"] = [0.0, -1.0]
    _write(s, f"{base_sf}/supplier.parquet", f"{out_dir}/supplier.parquet")

    p = base("part").copy()
    for i, nm in enumerate(nasty_names):
        p.loc[p.index[i * 5 % len(p)], "p_name"] = nm
    p.loc[p.index[0:2], "p_retailprice"] = [0.0, 0.01]
    _write(p, f"{base_sf}/part.parquet", f"{out_dir}/part.parquet")

    # embeddings: zero vectors (cosine normalization 0/0), exact-duplicate
    # vectors (top-k ties), huge/tiny magnitudes (quantization range)
    em = base("embeddings").copy()
    dim = len(em["embedding"].iloc[0])
    em.at[em.index[0], "embedding"] = np.zeros(dim, dtype=np.float32)
    em.at[em.index[1], "embedding"] = np.zeros(dim, dtype=np.float32)
    dup = np.asarray(em["embedding"].iloc[5], dtype=np.float32)
    em.at[em.index[6], "embedding"] = dup.copy()
    em.at[em.index[7], "embedding"] = dup.copy()
    # magnitude contract: PQ/SQ quantize components to integer micro-units
    # and sum squared distances in int64 — x50/x1e-3 stretch the range well
    # beyond the ~N(0,1) fixture without overflowing that envelope
    em.at[em.index[8], "embedding"] = (dup * 50.0).astype(np.float32)
    em.at[em.index[9], "embedding"] = (dup * 1e-3).astype(np.float32)
    em.at[em.index[10], "embedding"] = (-dup).astype(np.float32)
    _write(em, f"{base_sf}/embeddings.parquet", f"{out_dir}/embeddings.parquet")

    return out_dir
