"""Adversarial testdata generator for oracle-differential fuzzing.

Generates the same ten tables as the driver testdata
(FIXTURES.md §A schemas, timestamp[us] like the current generation)
but with HOSTILE distributions, then the standard parity harness
(tools/parity.py --sf <dir>) runs every oracle-checked query over them.
Any Spark/DuckDB divergence on this data is either a real engine-
semantics bug or an oracle-authoring assumption — both worth surfacing
before the driver or a user does. The degenerate-histogram-range bug
class (ADVICE r3: all-equal column ⇒ NULL buckets vs inf/NaN buckets)
is exactly what this sweep catches mechanically.

Profiles:
  degenerate (default) — values stay in the domains the oracles assume
    (clean numerics, known lang/status codes) but every SHAPE is
    hostile: empty/whitespace/unicode/duplicated text, all-equal
    columns, heavy key skew, orphan foreign keys, tied and boundary
    timestamps, zero/negative money, single-member groups.
  dirty — additionally plants NaN/±Inf/NULL in the columns whose
    cleaning contract covers them (events.value, acctbals,
    o_totalprice) plus a zero embedding vector (cosine 0/0),
    empty-JSON props rows, and NULL documents.text/lang/source rows
    (round 4: caught EIGHT cross-engine divergences — six from NULL
    text: nullable int metrics canonicalize as floats, Spark's
    size(split(NULL)) = -1 vs SQL NULL; two from the NULL key wave:
    the minhash oracle's array_to_string NULL-propagation vs Spark's
    concat_ws fold, and a len(None) crash in the multimodal Pandas
    extractor — all fixed by the "NULL text ≡ empty document" rule on
    metric/payload paths, NULL propagation kept on dedup paths).

Usage:
    python tools/fuzz_data.py --out /tmp/fuzz_sf --seed 7 [--profile dirty]
    python tools/parity.py --sf /tmp/fuzz_sf
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

US = 1_000_000  # microseconds per second

LANGS = ["en", "de", "es", "fr", "zh"]
SOURCES = [f"src{i}" for i in range(20)]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
WORDS = (
    "key agg row scan slow fast table value part hash merge batch window "
    "spark order data column join small line customer query filter the a"
).split()


def ts_us(iso: str) -> int:
    """ISO date/datetime → int64 epoch microseconds (UTC-naive)."""
    import datetime as dt

    d = dt.datetime.fromisoformat(iso)
    return int(d.replace(tzinfo=dt.timezone.utc).timestamp() * US)


def money(rng: np.random.Generator, n: int, lo: float = 0.0, hi: float = 90000.0):
    """Exact-cents doubles (decimal-cast-stable in both engines)."""
    return np.round(rng.uniform(lo, hi, n) * 100) / 100.0


def region_table() -> pa.Table:
    return pa.table(
        {
            "r_regionkey": pa.array(range(5), pa.int32()),
            "r_name": pa.array(REGIONS),
        }
    )


def nation_table() -> pa.Table:
    return pa.table(
        {
            "n_nationkey": pa.array(range(25), pa.int32()),
            "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
            "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
        }
    )


def customer_table(rng, n, dirty) -> pa.Table:
    acct = money(rng, n, -9999.99, 9999.99)
    acct[: n // 10] = 0.0  # a tenth of customers sit at exactly zero
    names = [f"Customer#{i:09d}" for i in range(n)]
    names[1] = "Customer#000000001"  # duplicate display name, distinct key
    names[2] = "Cüstömer 中文 🎉"
    names[3] = ""  # empty-string name
    seg = [SEGMENTS[i % 5] for i in range(n)]
    seg[4] = ""  # empty segment value
    cols = {
        "c_custkey": pa.array(range(1, n + 1), pa.int64()),
        "c_name": pa.array(names),
        "c_nationkey": pa.array([i % 25 for i in range(n)], pa.int32()),
        "c_acctbal": pa.array(acct),
        "c_mktsegment": pa.array(seg),
    }
    if dirty:
        a = acct.copy()
        a[5], a[6] = np.nan, np.inf
        mask = np.zeros(n, bool)
        mask[7] = True
        cols["c_acctbal"] = pa.array(np.where(mask, np.nan, a), mask=mask)
    return pa.table(cols)


def supplier_table(rng, n) -> pa.Table:
    return pa.table(
        {
            "s_suppkey": pa.array(range(1, n + 1), pa.int64()),
            "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n)]),
            "s_nationkey": pa.array([i % 25 for i in range(n)], pa.int32()),
            "s_acctbal": pa.array(money(rng, n, -1000, 11000)),
        }
    )


def part_table(rng, n) -> pa.Table:
    brands = [f"Brand#{1 + i % 25}" for i in range(n)]
    types = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
    sizes = np.where(np.arange(n) % 3 == 0, 7, rng.integers(1, 50, n))  # heavy mode at 7
    return pa.table(
        {
            "p_partkey": pa.array(range(1, n + 1), pa.int64()),
            # rows 0-3: numeric-looking names pin the try_cast contract
            # (fractional -> NULL both engines, padded/signed ints cast);
            # row 4: non-ASCII pins the levenshtein ASCII gate (r5);
            # rows 5-6: whitespace-dialect padding pins the WS-class
            # integer gate (advice r6) — \x0B is in-contract (DuckDB's
            # TRY_CAST trims it, crosshash.WS names it), U+2028 is
            # out-of-contract (only Spark's wider Java trimAll strips
            # it, so BOTH gated sides must yield NULL)
            "p_name": pa.array(
                ["1.5", " 42 ", "+7", "99999999999"]
                + ["pärt 中文 name 🎉", "\x0b42\t", "\u2028" + "42"]
                # rows 7-8: TRAILING U+2028 pins the \z anchors
                # (review r6: Java's $ matches before a final line
                # terminator, RE2's does not — an ASCII body with a
                # trailing U+2028 must fail both the integer gate and
                # the levenshtein ASCII gate on BOTH engines)
                + ["42" + "\u2028", "ascii tail" + "\u2028"]
                + [f"part {WORDS[i % len(WORDS)]} {i}" for i in range(9, n)]
            ),
            "p_brand": pa.array(brands),
            "p_type": pa.array([types[i % 6] for i in range(n)]),
            "p_size": pa.array(sizes, pa.int32()),
            # ALL-EQUAL retail price: degenerate (hi == lo) range for any
            # histogram/bucketing over this column
            "p_retailprice": pa.array(np.full(n, 1500.00)),
        }
    )


def orders_table(rng, n, n_cust, dirty) -> pa.Table:
    # key skew: half of all orders belong to customer 1; a 5% tail are
    # ORPHANS (custkey beyond the customer table) to exercise outer joins
    cust = np.where(
        rng.random(n) < 0.5, 1, rng.integers(1, n_cust + 1, n)
    ).astype("int64")
    cust[rng.random(n) < 0.05] = n_cust + 999
    total = money(rng, n, 0.0, 400000.0)
    total[0] = 0.0
    total[1] = -1.23  # negative money survives both engines' sums
    dates = ts_us("1995-01-01") + rng.integers(0, int(6.6 * 365 * 86400), n) * US
    dates[0] = ts_us("1970-01-01")  # epoch boundary
    dates[1] = ts_us("2000-02-29")  # leap day
    dates[2] = ts_us("1999-12-31T23:59:59")
    dates[3:13] = ts_us("1996-06-15")  # tied order dates
    cols = {
        "o_orderkey": pa.array(range(1, n + 1), pa.int64()),
        "o_custkey": pa.array(cust, pa.int64()),
        "o_orderstatus": pa.array([["O", "F", "P"][i % 3] for i in range(n)]),
        "o_totalprice": pa.array(total),
        "o_orderdate": pa.array(dates, pa.timestamp("us")),
        "o_orderpriority": pa.array([PRIORITIES[i % 5] for i in range(n)]),
    }
    if dirty:
        mask = np.zeros(n, bool)
        mask[4] = True
        cols["o_totalprice"] = pa.array(total, mask=mask)
        # out-of-domain + NULL order status (advice r6): every consumer
        # must pin its contract explicitly — pivot_status counts only
        # F/O/P but totals ALL rows; rollup/cube group the NULL like
        # SQL GROUP BY; status filters simply don't match either row
        status: list = [["O", "F", "P"][i % 3] for i in range(n)]
        status[5], status[6] = "X", None
        cols["o_orderstatus"] = pa.array(status)
    return pa.table(cols)


def lineitem_table(rng, n, n_orders, n_parts, n_supp) -> pa.Table:
    okey = rng.integers(1, n_orders + 1, n).astype("int64")
    okey[rng.random(n) < 0.03] = n_orders + 777  # orphan order keys
    qty = rng.integers(1, 51, n).astype("float64")
    qty[:200] = 25.0  # fat tie block
    qty[201] = -5.0  # out-of-domain for sqrt: NULL in both engines (r5)
    price = money(rng, n, 900.0, 105000.0)
    price[202] = 0.0  # ln(0) out-of-domain -> NULL both (r5)
    price[203] = -42.5  # negative money flows through decimal sums
    disc = np.round(rng.integers(0, 11, n) * 0.01, 2)
    disc[0] = 0.0
    disc[1] = 0.1
    tax = np.round(rng.integers(0, 9, n) * 0.01, 2)
    ship = ts_us("1995-01-02") + rng.integers(0, int(6.8 * 365 * 86400), n) * US
    ship[0] = ts_us("1995-01-02")
    ship[1] = ts_us("2001-11-04")
    return pa.table(
        {
            "l_orderkey": pa.array(okey, pa.int64()),
            "l_partkey": pa.array(rng.integers(1, n_parts + 1, n), pa.int64()),
            "l_suppkey": pa.array(rng.integers(1, n_supp + 1, n), pa.int64()),
            "l_linenumber": pa.array((np.arange(n) % 7 + 1).astype("int32"), pa.int32()),
            "l_quantity": pa.array(qty),
            "l_extendedprice": pa.array(price),
            "l_discount": pa.array(disc),
            "l_tax": pa.array(tax),
            "l_returnflag": pa.array([["A", "N", "R"][i % 3] for i in range(n)]),
            "l_linestatus": pa.array([["F", "O"][i % 2] for i in range(n)]),
            "l_shipdate": pa.array(ship, pa.timestamp("us")),
        }
    )


def events_table(rng, n, n_users, dirty) -> pa.Table:
    base = ts_us("2024-01-01")
    # bursts + ties: sessionization and watermark eviction edges. Users
    # are skewed (user 1 owns ~30%); timestamps include exact ties and
    # month-end stragglers.
    user = np.where(rng.random(n) < 0.3, 1, rng.integers(1, n_users + 1, n)).astype("int64")
    ts = base + np.sort(rng.integers(0, 30 * 86400, n)) * US
    ts[10:20] = ts[10]  # ten events at the identical microsecond
    ts[-1] = base + (30 * 86400 - 1) * US
    val = np.round(rng.uniform(0, 500, n), 6)
    val[:50] = 42.0  # all-equal block (zscore/stddev degenerate window)
    props = [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n)]
    props[0] = '{"k": 0}'
    cols = {
        "event_id": pa.array(range(1, n + 1), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(user, pa.int64()),
        "event_type": pa.array([EVENT_TYPES[i % 5] for i in range(n)]),
        "value": pa.array(val),
        "props": pa.array(props),
    }
    if dirty:
        v = val.copy()
        v[1], v[2] = np.inf, -np.inf
        # half-cent boundary values (verdict r5 item 4, pinned in
        # d532239's unit tests, now fuzz-enforced cross-engine): the
        # engines' double→DECIMAL(12,2) cast rounds the SHORTEST
        # DECIMAL REPR half away from zero — repr(1.005) → 1.01 even
        # though the binary double is 1.00499…; 0.125 is an exact
        # binary half-cent (±12.5 → ±13, banker's would give ±12);
        # planted OUTSIDE the all-equal [0:50) block so the zscore/
        # stddev degenerate-window shape survives
        v[50], v[51], v[52], v[53], v[54] = 1.005, 2.675, -1.005, 0.125, -0.125
        mask = np.zeros(n, bool)
        mask[3] = True
        cols["value"] = pa.array(v, mask=mask)
        props[4] = "{}"
        props[5] = "not json"  # malformed: NULL per-row, never a query error
        props[6] = '{"k": 1.5}'  # fractional: outside the integer contract
        props[7] = '{"k": "12"}'  # string-typed number: ditto (r5)
        cols["props"] = pa.array(props)
        # NULL event time + NULL user key (review r5: the streaming
        # window family and the watermark-dedup join diverged on
        # exactly these and the generator never produced them). Row 6
        # compounds both NULLs on one row.
        ts_mask = np.zeros(n, bool)
        ts_mask[5] = ts_mask[6] = True
        cols["ts"] = pa.array(ts, pa.timestamp("us"), mask=ts_mask)
        u_mask = np.zeros(n, bool)
        u_mask[6] = u_mask[7] = True
        cols["user_id"] = pa.array(user, pa.int64(), mask=u_mask)
    return pa.table(cols)


def documents_table(rng, n, dirty=False) -> pa.Table:
    texts: list[str | None] = []
    for i in range(n):
        k = rng.integers(3, 40)
        texts.append(" ".join(WORDS[j % len(WORDS)] for j in rng.integers(0, len(WORDS), k)))
    texts[0] = ""  # empty doc
    texts[1] = "   \t\n  "  # whitespace-only doc
    texts[2] = "solo"  # single token (no full bigram)
    texts[3] = "dup dup dup " * 60  # one token repeated (single distinct bigram)
    texts[4] = "héllo wörld naïve 中文 文本 🎉 emoji"
    texts[5] = texts[6] = texts[7] = "exact duplicate body of text here"  # exact dups
    texts[8] = "near duplicate body of text here"  # near-dup of the trio
    texts[9] = " ".join(WORDS) * 40  # very long doc
    # incremental-dedup branch plants (doc_id = index+1; the batch side
    # is doc_id ≡ 0 mod 10, i.e. indices 9, 19, 29, ...): a batch doc
    # duplicating the base trio → 'dup_base', and a batch-internal pair
    # → first 'new', second 'dup_batch'
    texts[19] = texts[5]
    texts[29] = texts[39] = "batch internal duplicate text body"
    # quality_gopher_rules gate plants (verdict r6 item 7): each doc
    # passes every Gopher gate EXCEPT exactly one, so a regression in
    # that single gate flips its passes_gopher boolean. All in-domain
    # text — planted on both profiles.
    # 1) required-word gate: 32 alphabetic words, mean length 5.0,
    #    zero hits on the required list (the/be/to/of/and/that/have/
    #    with) — fails ONLY n_required_hits >= 1
    texts[40] = " ".join(
        ["lorem", "ipsum", "dolor", "amet", "quartz", "jumbo", "flask", "nymph"] * 4
    )
    # 2) bullet-line gate: every non-blank line starts with '- '
    #    (ratio 1.0 > 0.9); the bare '-' tokens drag alpha ratio to
    #    50/60 ≈ 0.833, still above the 0.8 floor — fails ONLY bullets
    texts[41] = "\n".join(["- the quick brown fox jumps"] * 10)
    # 3) ellipsis-line gate: 2 of 5 lines end '...' (0.4 > 0.3);
    #    trailing dots keep tokens alphabetic — fails ONLY ellipses
    texts[42] = "\n".join(
        ["the quick brown fox jumps over..." if i < 2 else "the quick brown fox jumps over"
         for i in range(5)]
    )
    # 4) bullet boundary: 9 of 10 non-blank lines bulleted — ratio
    #    exactly 0.9 ≤ 0.9, must PASS on both engines (<= vs < split),
    #    with a blank line in the middle pinning NON_WS line filtering
    #    and leading-space bullets pinning trim-before-test
    texts[43] = "\n".join(
        ["  - the quick brown fox jumps"] * 9 + ["", "the quick brown fox jumps"]
    )
    if dirty:
        # regex-dialect divergence characters (the WS contract,
        # crosshash.WS): vertical tab splits under Java \s but not RE2
        # \s; NBSP and the line/paragraph separators split under Python
        # \s but under neither SQL engine. The explicit class must make
        # all three engines tokenize these identically.
        texts[14] = "vtab\x0bsplit mixed \x0b\t tail"
        texts[15] = "nbsp\u00a0glued line\u2028sep para\u2029sep end"
        # CRLF line endings (r9): line-based gates split on '\n', so
        # every line carries a trailing '\r' \u2014 the bullet/ellipsis
        # tests and any trim must treat it identically in Java regex,
        # Python, and DuckDB (DuckDB trim() strips spaces ONLY; a
        # "trim then test" implementation would diverge from Spark's)
        texts[17] = (
            "- the quick brown fox\r\n- jumps over it all...\r\nplain tail line\r\n"
        )
        # one giant token (r9): a 5000-char unbroken word \u2014 pins the
        # mean-word-length band (way out of range \u2192 gopher fail), the
        # single-token paths of BPE/winnowing/bigram miners, and any
        # char-vs-byte length split (pure ASCII on purpose; the emoji
        # doc pins multibyte)
        texts[18] = "x" * 5000
        # r10 plants: zero-length docs INTERLEAVED with the giant-token
        # doc in id-space (indices 18/20/21 are consecutive free slots
        # around it) — the tokenizer must not let an empty neighbor
        # perturb the prefix-join's df ordering — plus a NEAR-DUP of
        # the giant-token doc: the shared 5000-char gram becomes a
        # df=2 join key whose string length dwarfs the corpus, pinning
        # the prefix/positional prunes and the gram-hash paths against
        # degenerate-length tokens
        texts[20] = ""
        texts[21] = "x" * 5000 + " tail"
    if dirty:
        # SQL NULL text: the driver testdata never produces it, but any
        # real ingestion can — every text-consuming oracle must agree
        # with Spark on NULL propagation (split/len/window partitions)
        texts[11] = None
    # rotate through en/de/es/fr only, then give "zh" exactly ONE member:
    # a single-doc language exercises every per-lang groupBy/blocking path
    langs: list[str | None] = [LANGS[i % 4] for i in range(n)]
    langs[10] = "zh"
    sources: list[str | None] = [SOURCES[i % len(SOURCES)] for i in range(n)]
    if dirty:
        # NULL grouping/blocking keys: both engines must agree that a
        # NULL lang never equi-joins (so NULL-lang docs never pair in
        # per-lang blocking) yet DOES form its own GROUP BY partition
        langs[12] = None
        # whitespace-only lang (r10): unlike NULL it IS a real equi-join
        # key and a real GROUP BY value — two members so per-lang
        # blocking genuinely pairs docs under "   " while every
        # trim/normalize-free path keeps it distinct from both '' and
        # NULL on both engines
        langs[15] = langs[17] = "   "
        sources[13] = None
        # out-of-scheme source name: weight parsing must degrade to 0
        # on BOTH engines (Spark ANSI-off cast NULLs, DuckDB needs
        # TRY_CAST — corpus_mixture_plan), never error or NULL-poison
        sources[16] = "webcrawl"
    # r11 plants (both profiles): two languages whose per-lang Σdf²/Σdf
    # STRADDLES the containment auto-cap knife edge (_AUTO_CAP_RATIO =
    # 128). Each has 130 docs of the SAME single bigram "ka kb"
    # (df = 130) plus m single-use bigrams: ratio = (130² + m)/(130 + m)
    # — m=2 ("kh") lands at 128.04, just ABOVE the threshold; m=3
    # ("kl") at 127.09, just BELOW. The 130-clique docs' ONLY gram has
    # df > _AUTO_DF_CAP = 64, so under the capped hybrid the cooc_low
    # left join finds nothing and the array-only term must carry the
    # ENTIRE containment value (VERDICT r10 item 7); the clique also
    # feeds the registered uncapped key a 130-way exact-dup clique in
    # one lang (16 770 ordered pairs) through the driver oracle.
    # Since r12's _AUTO_CAP_MIN_S2 magnitude floor (ADVICE r11), these
    # ~17k-row streams no longer DRIVE an auto decision on their own —
    # the knife-edge ratio is pinned with the floor patched out
    # (tests/test_llm.py test_auto_df_cap_knife_edge) and the floor
    # itself at the real constant (test_auto_df_cap_magnitude_floor);
    # the plants' parity role here is the uncapped clique + the
    # all-high-df array-term regime, both unchanged.
    for lang_code, m in (("kh", 2), ("kl", 3)):
        for _ in range(130):
            texts.append("ka kb")
            langs.append(lang_code)
            sources.append(SOURCES[0])
        for i in range(m):
            texts.append(f"{lang_code}u{i} {lang_code}v{i}")
            langs.append(lang_code)
            sources.append(SOURCES[0])
    return pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(sources),
            "n_chars": pa.array(
                [len(t) if t is not None else 0 for t in texts], pa.int64()
            ),
        }
    )


def embeddings_table(rng, n, dim, dirty) -> pa.Table:
    m = rng.normal(0, 1, (n, dim)).astype("float32")
    m[1] = m[0]  # exact duplicate vector
    m[2] = m[0] * 1e6  # same direction, huge magnitude (cos == 1)
    m[3] = -m[0]  # antipodal (cos == -1)
    m[4] = m[4] * 1e-30  # denormal-scale magnitudes
    # r13 plant (VERDICT r12 item 6): a separated-blob block in rows
    # [100:150) — 10 blobs × 5 rows, centers 50·e_j (pairwise distance
    # ~70.7 vs intra-blob jitter σ=0.01), i.e. the geometry on which
    # the hierarchical semdedup assignment CONTRACTS exactness. Both
    # profiles carry it, so the fuzz parity sweep exercises every
    # clustering/near-dup key over genuinely clustered geometry next
    # to the hostile rows, and tests/test_llm.py's hier-vs-flat fuzz
    # check slices exactly these rows (plus the dirty hostile panel)
    # to assert drop-set equality under a genuinely PRUNING nprobe.
    # The plant is GATED on panel size, not asserted (ADVICE r13): a
    # future small/clean panel (n < 150 or dim < 10) simply SKIPS the
    # blob block — loudly, here, in the one place the decision lives —
    # instead of hard-failing a generator contract it never asked for.
    # Every current fuzz caller passes (150, 64), so both profiles DO
    # carry the plant today and the hier-exactness fuzz check stays
    # end-to-end (tests/test_llm.py slices rows [100:150) and would
    # fail on a silently missing plant, so the skip cannot rot unseen).
    if n >= 150 and dim >= 10:
        for j in range(10):
            blob = np.zeros(dim, dtype="float32")
            blob[j] = 50.0
            m[100 + 5 * j : 100 + 5 * (j + 1)] = blob + rng.normal(
                0, 0.01, (5, dim)
            ).astype("float32")
    rows: list[list[float] | None] = [row.tolist() for row in m]
    if dirty:
        # the plants below index rows[5..14] and the dyadic-tie plant
        # writes 4 leading components into rows[9]; a smaller panel
        # would silently fuzz a DIFFERENT contract (ADVICE r8) — with
        # dim < 4 rows[9] would become a length-4 ragged row instead
        # of a uniform dyadic pin (ADVICE r14) — asserted here
        # directly now that the blob plant above no longer implies it
        # (the r13 assert became a size gate)
        assert n > 14 and dim >= 4, (
            f"dirty plants need n > 14 and dim >= 4, got n={n} dim={dim}"
        )
        m[5] = 0.0  # zero vector: cosine denominator 0 in both engines
        # 1e8-scale entries: the regime where blocked-BLAS vs
        # sequential-fold float error grows to ~1e2 absolute — pins the
        # magnitude-RELATIVE knife-edge margins in the LSH sign dots
        # and the Lloyd argmin (an absolute epsilon breaks exactly here)
        m[6] = m[6] * 1e8
        rows = [row.tolist() for row in m]
        # exact decimal-tie dyadics (x.xxxxxx5 with terminating binary
        # expansion): a double→DECIMAL(24,6) cast rounds these half-up
        # from the shortest repr in Spark but half-even from the exact
        # binary in DuckDB — the r6 seed-23 split. The 6-dp contract is
        # now pure-IEEE floor arithmetic; these rows keep it pinned.
        rows[9] = [0.5078125, -0.5078125, 2.5078125, -2.5078125] + rows[9][4:]
        # undefined vectors INSIDE the query panel (vec_id 8, 9 < 10):
        # NULL and empty embeddings are excluded from every search /
        # near-dup operator on both engines (valid_vectors ↔ the
        # oracles' len()>0 gate) and NULL-propagate through the
        # profiling ops — review r5
        rows[7] = None
        rows[8] = []
        # ragged SHORTER vector (dim−1): the round-8 family-wide
        # uniform-dimensionality contract — cosine against the corpus
        # is engine-divergent for it (Spark zip_with NULL-poisons the
        # fold, DuckDB list ops skip the missing tail) and np.stack in
        # the pandas-UDF paths crashes, so every search/near-dup
        # operator excludes it on BOTH engines (uniform_vectors ↔
        # UNIFORM_VEC_CTES). Per-row profiling ops (array_ops,
        # embedding_quantize, sql_explode) keep it and must agree
        # per-row.
        rows[10] = rows[10][: dim - 1]
        # NON-FINITE components (round 9): an Inf or NaN component
        # gives a real-NaN cosine against everything (inf/inf or
        # nan-propagation), and real-NaN threshold comparisons are
        # engine-divergent in OPPOSITE directions — Python/numpy IEEE
        # says NaN ≥ t is false, DuckDB's total order says TRUE (an
        # Inf vector "near-dups" the whole corpus in the oracle and
        # nothing in the engine), and DuckDB ERRORS casting real NaN
        # to INTEGER where Spark's non-ANSI cast yields 0 (the
        # quantize digests). Note the zero vector (rows[5]) never
        # tripped this: DuckDB 0/0 is NULL, not NaN. The family-wide
        # finite-vector contract excludes all three from search /
        # near-dup on both engines (uniform_vectors ↔
        # UNIFORM_VEC_CTES) and NULLs their quantize digests.
        rows[11] = [float("inf")] + rows[11][1:]  # +Inf component
        rows[12] = [float("-inf")] * dim  # all -Inf
        rows[13] = rows[13][:-1] + [float("nan")]  # NaN component
        rows[14] = [None] + rows[14][1:]  # NULL component (right length)
    return pa.table(
        {
            "vec_id": pa.array(range(1, n + 1), pa.int64()),
            "embedding": pa.array(rows, pa.list_(pa.float32())),
            "label": pa.array([i % 10 for i in range(n)], pa.int32()),
        }
    )


def generate(out_dir: str, seed: int, profile: str) -> None:
    rng = np.random.default_rng(seed)
    dirty = profile == "dirty"
    n_cust, n_supp, n_part, n_ord, n_li = 300, 40, 120, 2000, 5000
    tables = {
        "region": region_table(),
        "nation": nation_table(),
        "customer": customer_table(rng, n_cust, dirty),
        "supplier": supplier_table(rng, n_supp),
        "part": part_table(rng, n_part),
        "orders": orders_table(rng, n_ord, n_cust, dirty),
        "lineitem": lineitem_table(rng, n_li, n_ord, n_part, n_supp),
        "events": events_table(rng, 2000, 120, dirty),
        "documents": documents_table(rng, 150, dirty),
        "embeddings": embeddings_table(rng, 150, 64, dirty),
    }
    os.makedirs(out_dir, exist_ok=True)
    for name, tbl in tables.items():
        pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"))
    print(f"wrote {len(tables)} adversarial tables ({profile}) to {out_dir}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--profile", choices=["degenerate", "dirty"], default="degenerate")
    args = ap.parse_args()
    generate(args.out, args.seed, args.profile)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
