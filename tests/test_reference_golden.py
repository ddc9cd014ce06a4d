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
