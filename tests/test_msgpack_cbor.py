"""Schema-less binary serdes (r14 wave 4): MessagePack + CBOR — golden
vectors straight from the public specs (the msgpack spec's worked
example; RFC 8949 Appendix A rows), hypothesis roundtrips over nested
values, the half-float ladder pinned against ``struct`` on every bit
pattern, hostile-width acceptance, and every documented error path.
No msgpack/cbor runtime exists in this container — the specs' own
examples are the interchange pin."""

from __future__ import annotations

import math
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streams_common_spark.operators import cbor as cb
from kafka_streams_common_spark.operators import msgpack as mp

# ---------------------------------------------------------------------------
# MessagePack — spec golden vectors
# ---------------------------------------------------------------------------


def test_msgpack_spec_example():
    # the msgpack spec README's canonical example:
    # {"compact": true, "schema": 0}
    wire = bytes.fromhex("82a7636f6d70616374c3a6736368656d6100")
    assert mp.msgpack_loads(wire) == {"compact": True, "schema": 0}


def test_msgpack_family_golden():
    cases = [
        (b"\x00", 0),
        (b"\x7f", 127),
        (b"\xe0", -32),
        (b"\xff", -1),
        (b"\xcc\x80", 128),
        (b"\xcd\x01\x00", 256),
        (b"\xce\x00\x01\x00\x00", 65536),
        (b"\xd0\xdf", -33),
        (b"\xd1\xff\x00", -256),
        (b"\xc0", None),
        (b"\xc2", False),
        (b"\xc3", True),
        (b"\xa3foo", "foo"),
        (b"\xd9\x03foo", "foo"),  # same value, str8 width
        (b"\xc4\x02\x01\x02", b"\x01\x02"),
        (b"\x92\x01\x02", [1, 2]),
        (b"\xdc\x00\x02\x01\x02", [1, 2]),  # array16 width
        (b"\xcb" + struct.pack(">d", -4.1), -4.1),
    ]
    for wire, want in cases:
        assert mp.msgpack_loads(wire) == want, wire.hex()


def test_msgpack_nonminimal_widths_accepted():
    # 1 encoded as every uint family — all legal on the wire
    for wire in (b"\x01", b"\xcc\x01", b"\xcd\x00\x01", b"\xce\x00\x00\x00\x01",
                 b"\xcf" + b"\x00" * 7 + b"\x01"):
        assert mp.msgpack_loads(wire) == 1


def test_msgpack_errors():
    with pytest.raises(ValueError, match="truncated"):
        mp.msgpack_loads(b"\xcd\x01")  # uint16 with one byte
    with pytest.raises(ValueError, match="truncated"):
        mp.msgpack_loads(b"\xa5ab")  # fixstr 5 with 2 bytes
    with pytest.raises(ValueError, match="trailing"):
        mp.msgpack_loads(b"\x01\x02")  # two objects in one message
    with pytest.raises(ValueError, match="truncated"):
        mp.msgpack_loads(b"\x92\x01")  # fixarray 2 with one element
    with pytest.raises(ValueError, match="unsupported msgpack marker"):
        mp.msgpack_loads(b"\xc1")  # never-used marker per spec


# a generic msgpack encoder over test values, built from the module's
# own primitives (the module encodes fixtures, not arbitrary objects)
def _mp_enc(v) -> bytes:
    if v is None:
        return mp._NIL
    if isinstance(v, bool):
        return mp._TRUE if v else mp._FALSE
    if isinstance(v, int):
        return mp._mp_int(v)
    if isinstance(v, float):
        return mp._mp_float64(v)
    if isinstance(v, str):
        return mp._mp_str(v)
    if isinstance(v, bytes):
        return mp._mp_bin(v)
    if isinstance(v, list):
        return mp._mp_array_header(len(v)) + b"".join(_mp_enc(x) for x in v)
    if isinstance(v, dict):
        return mp._mp_map_header(len(v)) + b"".join(
            _mp_enc(k) + _mp_enc(x) for k, x in v.items()
        )
    raise TypeError(type(v))


_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**64 - 1),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=40),
    st.binary(max_size=40),
)
_value = st.recursive(
    _scalar,
    lambda inner: st.one_of(
        st.lists(inner, max_size=5),
        st.dictionaries(st.text(max_size=8), inner, max_size=5),
    ),
    max_leaves=12,
)


@settings(deadline=None, max_examples=150)
@given(_value)
def test_msgpack_roundtrip(v):
    assert mp.msgpack_loads(_mp_enc(v)) == v


# ---------------------------------------------------------------------------
# CBOR — RFC 8949 Appendix A golden vectors
# ---------------------------------------------------------------------------

CBOR_APPENDIX_A = [
    ("00", 0),
    ("17", 23),
    ("1818", 24),
    ("190100", 256),
    ("1a000f4240", 1000000),
    ("20", -1),
    ("3863", -100),
    ("f4", False),
    ("f5", True),
    ("f6", None),
    ("6449455446", "IETF"),
    ("62225c", '"\\'),
    ("83010203", [1, 2, 3]),
    ("a26161016162820203", {"a": 1, "b": [2, 3]}),
    ("f93e00", 1.5),
    ("f97bff", 65504.0),
    ("fa47c35000", 100000.0),
    ("fbc010666666666666", -4.1),
    ("c249010000000000000000", 18446744073709551616),  # tag 2 bignum
    ("7f657374726561646d696e67ff", "streaming"),  # indefinite text
    ("9fff", []),  # indefinite empty array
    ("9f018202039f0405ffff", [1, [2, 3], [4, 5]]),  # nested indefinite
    ("bf61610161629f0203ffff", {"a": 1, "b": [2, 3]}),  # indefinite map
]


def test_cbor_appendix_a():
    for hx, want in CBOR_APPENDIX_A:
        got = cb.cbor_loads(bytes.fromhex(hx))
        if isinstance(want, float):
            assert got == pytest.approx(want)
        else:
            assert got == want, hx


def test_cbor_nonminimal_widths_accepted():
    # 1 with every argument width — legal, non-canonical
    for hx in ("01", "1801", "190001", "1a00000001", "1b0000000000000001"):
        assert cb.cbor_loads(bytes.fromhex(hx)) == 1


def test_cbor_half_float_ladder_exhaustive():
    # every finite/inf/nan 16-bit pattern vs struct's native half decode
    for h in range(1 << 16):
        want = struct.unpack(">e", h.to_bytes(2, "big"))[0]
        got = cb._half_to_float(h)
        assert (math.isnan(got) and math.isnan(want)) or got == want, hex(h)


def test_cbor_errors():
    with pytest.raises(ValueError, match="truncated"):
        cb.cbor_loads(bytes.fromhex("19"))  # uint16 arg missing
    with pytest.raises(ValueError, match="truncated"):
        cb.cbor_loads(bytes.fromhex("6449455446")[:-1])
    with pytest.raises(ValueError, match="trailing"):
        cb.cbor_loads(bytes.fromhex("0001"))
    with pytest.raises(ValueError, match="break outside"):
        cb.cbor_loads(b"\xff")
    with pytest.raises(ValueError, match="wrong type"):
        cb.cbor_loads(bytes.fromhex("7f4161ff"))  # byte chunk in text string
    with pytest.raises(ValueError, match="unterminated"):
        cb.cbor_loads(bytes.fromhex("7f6161"))  # no break
    with pytest.raises(ValueError, match="break inside definite"):
        cb.cbor_loads(bytes.fromhex("82ff01"))
    with pytest.raises(ValueError, match="tag 2 content"):
        cb.cbor_loads(bytes.fromhex("c201"))  # bignum content not bytes
    with pytest.raises(ValueError, match="reserved additional info"):
        cb.cbor_loads(bytes.fromhex("1c"))  # ai=28 reserved


def _cb_enc(v) -> bytes:
    if v is None:
        return cb._NULL
    if isinstance(v, bool):
        return cb._TRUE if v else cb._FALSE
    if isinstance(v, int):
        return cb._cb_int(v) if -(2**64) <= v < 2**64 else cb._cb_bignum(v)
    if isinstance(v, float):
        return cb._cb_float64(v)
    if isinstance(v, str):
        return cb._cb_text(v)
    if isinstance(v, bytes):
        return cb._cb_bytes(v)
    if isinstance(v, list):
        return cb._cb_head(4, len(v)) + b"".join(_cb_enc(x) for x in v)
    if isinstance(v, dict):
        return cb._cb_head(5, len(v)) + b"".join(
            _cb_enc(k) + _cb_enc(x) for k, x in v.items()
        )
    raise TypeError(type(v))


@settings(deadline=None, max_examples=150)
@given(_value)
def test_cbor_roundtrip(v):
    assert cb.cbor_loads(_cb_enc(v)) == v


@settings(deadline=None, max_examples=100)
@given(st.text(min_size=2, max_size=60), st.integers(min_value=2, max_value=5))
def test_cbor_indefinite_text_chunking_roundtrip(s, chunks):
    assert cb.cbor_loads(cb._cb_text(s, chunks=chunks)) == s


# ---------------------------------------------------------------------------
# fixture wire policy — the hostile widths are actually on the wire
# ---------------------------------------------------------------------------


def test_msgpack_fixture_widths_on_wire():
    even = mp._event_msgpack(4, "click", 1.0, 700)
    odd = mp._event_msgpack(7, "view", 1.0, 300)
    assert even[:1] == b"\xde"  # map16 top level on %4==0
    assert even[1:3] == b"\x00\x08"
    assert odd[0] & 0xF0 == 0x80  # fixmap otherwise
    # uint32-padded id on even ids: marker 0xce right after the "id" key
    assert b"\xa2id\xce\x00\x00\x00\x04" in even
    assert b"\xa2id\x07" in odd


def test_cbor_fixture_forms_on_wire():
    even = cb._event_cbor(6, "click", 1.0, 700)
    odd = cb._event_cbor(7, "view", 1.0, 300)
    assert even[:1] == b"\xbf" and even[-1:] == b"\xff"  # indefinite map
    assert odd[0] >> 5 == 5  # definite map
    assert b"\x62id\x1a\x00\x00\x00\x08" in cb._event_cbor(8, "x", 0.0, 1)
    m = cb.cbor_loads(even)
    assert m["flagged"] is True and m["half"] == 1.5
