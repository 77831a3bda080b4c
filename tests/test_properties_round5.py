"""Property-based validation (no Spark needed) of the two nontrivial
engine-neutrality claims introduced with the round-5/6 batches:

1. text_bpe_encode's central claim: for the chosen _BPE_MERGES table,
   non-overlapping left-to-right SUBSTRING REPLACEMENT on the
   space-separated symbol string equals TRUE pairwise BPE merging — for
   EVERY word, not just the fixture's. (Python str.replace has the same
   left-to-right non-overlapping semantics as Spark's replace() and
   DuckDB's replace(), so it stands in for both engines here.)

2. sketch_hll_det's rho: the hex-string computation (strip leading '0'
   nibbles + nibble CASE) equals the arithmetic leading-zero rank of the
   52-bit integer, for every value.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from hh_rumors_presto_spark.queries.curation_round5 import _BPE_MERGES


def _bpe_reference(word: str) -> list[str]:
    """Textbook BPE: apply each merge rule in table order, scanning
    left-to-right and merging greedily."""
    syms = list(word)
    for pat, rep in _BPE_MERGES:
        a, b = pat.split(" ")
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(rep)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _bpe_replace_chain(word: str) -> list[str]:
    """The engine implementation: spread chars, then chained substring
    replaces (str.replace == Spark replace == DuckDB replace)."""
    s = " ".join(word)
    for pat, rep in _BPE_MERGES:
        s = s.replace(pat, rep)
    return s.split(" ") if s else []


@settings(max_examples=2000, deadline=None)
@given(st.text(alphabet="theinandoursq", min_size=0, max_size=16))
def test_replace_chain_is_exact_bpe_on_merge_alphabet(word):
    assert _bpe_replace_chain(word) == _bpe_reference(word)


@settings(max_examples=1000, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=0, max_size=20))
def test_replace_chain_is_exact_bpe_on_full_alphabet(word):
    assert _bpe_replace_chain(word) == _bpe_reference(word)


def _rho_via_hex(value52: int) -> int:
    """sketch_hll_det's string path over the 13-hex-char rank field."""
    rem = format(value52, "013x")
    stripped = rem.lstrip("0")
    if not stripped:
        return 4 * 13 + 1
    nib = int(stripped[0], 16)
    extra = 3 if nib == 1 else 2 if nib < 4 else 1 if nib < 8 else 0
    return 4 * (13 - len(stripped)) + extra + 1


@settings(max_examples=2000, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 52) - 1))
def test_hex_rho_equals_arithmetic_leading_zero_rank(v):
    want = 53 if v == 0 else (52 - v.bit_length()) + 1
    assert _rho_via_hex(v) == want


def test_rho_boundary_values():
    assert _rho_via_hex(0) == 53
    assert _rho_via_hex(1) == 52
    assert _rho_via_hex((1 << 52) - 1) == 1
    assert _rho_via_hex(1 << 51) == 1
    assert _rho_via_hex(1 << 50) == 2


def test_decimal_cast_portability_edge_is_out_of_contract():
    """Documents a real cross-engine edge found by probing fuzz_verify
    with 3-decimal money: for 437421.005, Spark's double->DECIMAL(28,2)
    goes through the SHORTEST DECIMAL STRING ('437421.005' -> HALF_UP ->
    .01) while DuckDB rescales the BINARY VALUE and rounds HALF-TO-EVEN
    at the resulting exact midpoint (43742100.5 -> .00) — different
    answers from the same stored double. For IN-CONTRACT money (doubles nearest to an
    exactly-2-decimal value) the rescale error is ~1e-9 of a cent, so
    both engines agree — this test pins that contract boundary so nobody
    widens the fixture generator past it without noticing."""
    import duckdb
    from decimal import Decimal

    v = 437421.005
    assert repr(v) == "437421.005"  # shortest repr shows .005
    # the binary value is NOT the semantic .005 (it sits ~4.7e-9 above);
    # its double rescale lands on an exact midpoint, where DuckDB rounds
    # HALF-TO-EVEN (down to .00) and Spark's string path HALF-UP (.01)
    assert Decimal(v) != Decimal("437421.005")
    assert v * 100 == 43742100.5  # exact representable midpoint
    got = duckdb.sql(
        f"SELECT CAST(CAST({v!r} AS DOUBLE) AS DECIMAL(28,2))"
    ).fetchone()[0]
    assert str(got) == "437421.00"  # DuckDB: half-even at the midpoint
    # (Spark yields 437421.01 for the same input — string-mediated; not
    # asserted here to keep this test Spark-free, but verified in-session)

    # in-contract: nearest-double-to-2-decimals is cast identically
    for k in (12345, 99999, 437421):
        for cents in (44, 45, 99):
            w = round(k + cents / 100, 2)
            got = duckdb.sql(
                f"SELECT CAST(CAST({w!r} AS DOUBLE) AS DECIMAL(28,2))"
            ).fetchone()[0]
            assert float(got) == w
