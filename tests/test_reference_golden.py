"""Cross-implementation fixtures consumed VERBATIM from the reference's
pg_regress golden outputs (read-only): digest text literals and
malformed-input vectors from /root/reference/test/expected/
conversions.out and cast.out.  Unlike the re-derived fixtures in
test_kernel_tdigest.py, nothing here is computed by this engine first —
the expected strings were produced by the reference implementation
itself, so these tests pin wire/text/json/array format parity directly.

Parity: tdigest_in/out (tdigest.c:2612-2824), legacy flags=0 format
conversion (tdigest.c:832-864), json cast (tdigest.c:2964-3021),
double[] cast (tdigest.c:3039-3081), input validation
(tdigest.c:2637-2785).
"""

from __future__ import annotations

import re
from decimal import ROUND_HALF_UP, Decimal
from pathlib import Path

import pytest

from tdigest_spark.kernel.tdigest import TDigest

EXPECTED = Path("/root/reference/test/expected")


def _conversion_blocks() -> list[tuple[str, str | None, str | None]]:
    """(input_literal, golden_text | None, golden_error | None) per
    SELECT in conversions.out."""
    text = (EXPECTED / "conversions.out").read_text()
    out = []
    stmts = re.split(r"(?=SELECT ')", text)
    for s in stmts:
        m = re.match(r"SELECT '([^']+)'::tdigest;", s)
        if not m:
            continue
        err = re.search(r"ERROR:\s+(.*)", s)
        if err:
            out.append((m.group(1), None, err.group(1).strip()))
        else:
            # result line: first line after the dashed separator
            res = re.search(r"\n-+\s*\n\s*(.*?)\s*\n\(1 row\)", s)
            assert res, s
            out.append((m.group(1), res.group(1).strip(), None))
    return out


def _cast_goldens() -> tuple[list[dict], list[list[str]]]:
    """The 3 json digests and 3 rounded double[] casts from cast.out
    (built by the reference from i/1000.0, i=1..1000 at compression
    10/25/100)."""
    text = (EXPECTED / "cast.out").read_text()
    jsons = []
    for m in re.finditer(r"\{\"flags\".*?\}", text):
        j = m.group(0)
        fields = {
            k: int(v)
            for k, v in re.findall(r'"(flags|count|compression|centroids)": (\d+)[,}]', j)
        }
        mean = [x.strip() for x in re.search(r'"mean": \[([^\]]*)\]', j).group(1).split(",")]
        cnts = [int(x) for x in re.search(r'"count": \[([^\]]*)\]', j).group(1).split(",")]
        jsons.append({"raw": j, **fields, "mean": mean, "cnts": cnts})
    arrays = [
        m.group(1).split(",") for m in re.finditer(r"\{([-0-9.,]+)\}", text)
    ]
    assert len(jsons) == 3 and len(arrays) == 3
    return jsons, arrays


def _digest_from_json_golden(g: dict) -> TDigest:
    """Rebuild the reference-produced digest through OUR text parser —
    the acceptance half of the fixture."""
    lit = (
        f"flags {g['flags']} count {g['count']} "
        f"compression {g['compression']} centroids {g['centroids']}"
        + "".join(
            f" ({float(m):.6f}, {c})" for m, c in zip(g["mean"], g["cnts"])
        )
    )
    return TDigest.from_string(lit)


def test_conversions_valid_literal_roundtrips_to_golden():
    """The flags=0 (sum,count) literal must parse, convert sum→mean, and
    print EXACTLY the golden flags=1 text; text→bytes→text must be the
    identity on it."""
    blocks = _conversion_blocks()
    valid = [(lit, exp) for lit, exp, err in blocks if err is None]
    assert len(valid) == 1
    lit, golden = valid[0]
    d = TDigest.from_string(lit)
    assert d.to_string() == golden
    assert TDigest.from_bytes(d.to_bytes()).to_string() == golden
    # the golden text itself parses and is a fixed point of the format
    assert TDigest.from_string(golden).to_string() == golden


# reference error message -> fragment our ValueError must carry
_ERR_SEMANTICS = [
    ("count value for the t-digest must be positive", "must be positive"),
    ("total count does not match the data", "total count"),
    ("centroids not sorted by mean", "sorted by mean"),
]


def test_conversions_malformed_vectors_rejected():
    """conversions.sql:4-13 — negative count, mismatching total count,
    unsorted centroids — must be rejected with matching semantics."""
    blocks = _conversion_blocks()
    errors = [(lit, err) for lit, exp, err in blocks if err is not None]
    assert len(errors) == 3
    for (lit, golden_err), (ref_msg, fragment) in zip(errors, _ERR_SEMANTICS):
        assert golden_err.startswith(ref_msg), (golden_err, ref_msg)
        with pytest.raises(ValueError, match=fragment):
            TDigest.from_string(lit)


def test_cast_out_json_parity():
    """Digests the reference built at compression 10/25/100 (cast.out)
    must round-trip through our parser and re-print byte-identical
    json — including the duplicated "count" key and %g mean layout."""
    jsons, _ = _cast_goldens()
    for g in jsons:
        d = _digest_from_json_golden(g)
        assert d.to_json() == g["raw"]
        assert TDigest.from_bytes(d.to_bytes()).to_json() == g["raw"]


def test_cast_out_double_array_parity():
    """The double precision[] cast must reproduce cast.out's golden
    arrays under PostgreSQL's numeric rounding (shortest-repr decimal,
    half-up at 3 places)."""
    jsons, arrays = _cast_goldens()
    q = Decimal("0.001")
    for g, golden in zip(jsons, arrays):
        d = _digest_from_json_golden(g)
        got = [
            str(Decimal(repr(float(v))).quantize(q, rounding=ROUND_HALF_UP))
            for v in d.to_double_array()
        ]
        want = [str(Decimal(v).quantize(q)) for v in golden]
        assert got == want, g["compression"]


# ----------------------------------------------------------------------
# incremental.out / copy.out — protocol fixtures.  Unlike conversions/
# cast these golden files carry NO literal digest strings (their
# expected outputs are equality verdicts over md5-ordered / random
# inputs), so what they pin is the PROTOCOL: incremental no-compact
# accumulation + one forced compaction must equal the batch build
# textually, and COPY text/binary round-trips must be byte-stable.
# The md5(i::text) feeding order is recomputed here exactly, so the
# incremental scenarios run the reference's own input sequences.
# Parity: incremental.sql:36-81 via incremental.out:30-87 (three DO
# loops: scalar / array / digest union), copy.sql via copy.out:22-35
# (COPY text + FORMAT BINARY, 200 rows, 0 mismatches).
# ----------------------------------------------------------------------

import hashlib

import numpy as np

from tdigest_spark.spark.functions import union_pair_bytes

_NO_COMPACT = 1 << 62


def _md5_order(n: int = 1000) -> list[int]:
    """generate_series(1,n) ORDER BY md5(i::text) — PG's md5() is the
    lowercase hex digest of the decimal text, bit-reproducible here."""
    return sorted(range(1, n + 1), key=lambda i: hashlib.md5(str(i).encode()).hexdigest())


def _force_compact_text(d: TDigest) -> str:
    """tdigest(d) / tdigest_union(NULL, d) — the reference's documented
    force-compaction idiom closing each incremental loop."""
    return TDigest.from_bytes(
        union_pair_bytes(None, d.to_bytes(compact=False))
    ).to_string()


def test_incremental_out_scalar_equals_batch():
    """incremental.out:30-49 — 1000 values fed ONE AT A TIME in
    md5(i::text) order with compact=false, then a single forced
    compaction, must print the same text as the one-shot batch build
    over the same sequence."""
    order = _md5_order()
    incr = TDigest(100)
    for i in order:
        incr.add_values([float(i)], compact_threshold=_NO_COMPACT)
    batch = TDigest(100)
    batch.add_values(np.array(order, dtype=np.float64))
    assert _force_compact_text(incr) == TDigest.from_bytes(batch.to_bytes()).to_string()


def test_incremental_out_array_equals_batch():
    """incremental.out:51-66 — bulk adds of 5 arrays grouped by
    mod(i,5), md5-ordered WITHIN each group, vs the batch build over
    the same groups in ascending-i order: the no-compact accumulation
    makes feeding order irrelevant (compaction sorts by mean), which is
    exactly what the reference's 't' verdict asserts."""
    groups: dict[int, list[int]] = {a: [] for a in range(5)}
    for i in _md5_order():
        groups[i % 5].append(i)
    incr = TDigest(100)
    for a in range(5):
        incr.add_values(
            np.array(groups[a], dtype=np.float64), compact_threshold=_NO_COMPACT
        )
    batch = TDigest(100)
    batch.add_values(
        np.array(
            [i for a in range(5) for i in sorted(groups[a])], dtype=np.float64
        )
    )
    assert _force_compact_text(incr) == TDigest.from_bytes(batch.to_bytes()).to_string()


def test_incremental_out_digest_union_equals_union_agg():
    """incremental.out:68-87 — per-group digests folded in one at a
    time with tdigest_union(..., compact=false) + one final compaction
    must equal the union AGGREGATE of the same digests (emulated with
    the aggregate's add_centroids merge + final recompact)."""
    groups: dict[int, list[int]] = {a: [] for a in range(5)}
    for i in _md5_order():
        groups[i % 5].append(i)
    per_group = []
    for a in range(5):
        g = TDigest(100)
        g.add_values(np.array(groups[a], dtype=np.float64))
        per_group.append(g)
    acc = None
    for g in per_group:
        acc = union_pair_bytes(acc, g.to_bytes(), compact=False)
    incr_text = TDigest.from_bytes(union_pair_bytes(None, acc)).to_string()
    agg = TDigest(100)
    for g in per_group:
        agg.add_centroids(*g.centroid_arrays(), compact_threshold=_NO_COMPACT)
    agg.recompact()
    assert incr_text == agg.to_string()


def test_copy_out_text_and_binary_roundtrip_stability():
    """copy.out:22-35 — 100 digests at random compressions in
    [100, 1100), each over compression×10 uniform values (seeded here,
    so the corpus is fixed), exported+imported through BOTH the text
    format and the big-endian wire format: every re-import must print
    text identical to its source, 0 mismatches in 200 comparisons."""
    rng = np.random.RandomState(20260817)
    mismatches = 0
    for i in range(100):
        compression = int(100 + rng.rand() * 1000)
        d = TDigest(compression)
        d.add_values(rng.rand(compression * 10))
        src_text = d.to_string()
        # COPY text: out -> in -> out
        if TDigest.from_string(src_text).to_string() != src_text:
            mismatches += 1
        # COPY binary: send -> recv -> ::text
        if TDigest.from_bytes(d.to_bytes()).to_string() != src_text:
            mismatches += 1
    assert mismatches == 0
