"""Property tests for the round-6 codecs: FLAC must round-trip ANY
int-range PCM bit-exactly across block sizes, channel counts, and
forced subframe families (lossless is a universal property, not a
fixture set), and HTML extraction must return exactly the visible text
for any markup-free payload wrapped in a page skeleton."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from elevate_data_pipeline_spark.functions.text import html_to_text
from elevate_data_pipeline_spark.operators import multimodal as mm

SAMPLE = st.integers(min_value=-32768, max_value=32767)


@settings(max_examples=60, deadline=None)
@given(
    sig=st.lists(SAMPLE, min_size=0, max_size=600),
    block=st.sampled_from([16, 64, 192, 4096]),
    force=st.sampled_from([None, "verbatim", "lpc"]),
)
def test_flac_roundtrip_property(sig, block, force):
    dec = mm.decode_flac(mm.encode_flac(sig, block_size=block, force=force))
    assert dec.samples == sig
    assert (dec.channels, dec.bits) == (1, 16)


@settings(max_examples=30, deadline=None)
@given(
    left=st.lists(SAMPLE, min_size=1, max_size=300),
    block=st.sampled_from([32, 128]),
)
def test_flac_stereo_roundtrip_property(left, block):
    right = [(-s) if s != -32768 else 0 for s in left]
    inter = [v for pair in zip(left, right) for v in pair]
    dec = mm.decode_flac(mm.encode_flac(inter, channels=2, block_size=block))
    assert dec.samples == inter and dec.channels == 2


# visible text: anything without markup metacharacters or entity intros
VISIBLE = st.text(
    alphabet="abcdefgh XYZ012.,!?'\n\t", min_size=0, max_size=200
)


@settings(max_examples=80, deadline=None)
@given(body=VISIBLE, title=VISIBLE)
def test_html_extract_identity_property(body, title):
    page = (
        "<html><head><title>" + title + "</title>"
        '<script>var a = "<b>decoy</b>";</script><style>.x{}</style>'
        "</head><body><div><p>" + body + "</p></div></body></html>"
    )
    assert html_to_text(page) == title + body


_EXIF_ASCII = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0, max_size=24,
)
_EXIF_ENTRY = st.one_of(
    st.tuples(st.integers(256, 60000), st.just(2),
              st.tuples(_EXIF_ASCII).map(list)),
    st.tuples(st.integers(256, 60000), st.just(3),
              st.lists(st.integers(0, 65535), min_size=1, max_size=4)),
    st.tuples(st.integers(256, 60000), st.just(4),
              st.lists(st.integers(0, 2**32 - 1), min_size=1, max_size=3)),
    st.tuples(st.integers(256, 60000), st.just(5),
              st.lists(st.tuples(st.integers(0, 2**32 - 1),
                                 st.integers(1, 2**32 - 1)),
                       min_size=1, max_size=3)),
    st.tuples(st.integers(256, 60000), st.just(9),
              st.lists(st.integers(-2**31, 2**31 - 1), min_size=1, max_size=3)),
    st.tuples(st.integers(256, 60000), st.just(10),
              st.lists(st.tuples(st.integers(-2**31, 2**31 - 1),
                                 st.integers(1, 2**31 - 1)),
                       min_size=1, max_size=2)),
)


def _exif_expect(tag, typ, values):
    if typ == 2:
        return values[0]
    if typ in (5, 10):
        return " ".join(f"{n}/{d}" for n, d in values)
    return " ".join(str(v) for v in values)


@settings(max_examples=60, deadline=None)
@given(
    ifd0=st.lists(_EXIF_ENTRY, min_size=1, max_size=6,
                  unique_by=lambda e: e[0]),
    exif=st.one_of(st.none(), st.lists(_EXIF_ENTRY, min_size=1, max_size=5,
                                       unique_by=lambda e: e[0])),
    bo=st.sampled_from(["II", "MM"]),
)
def test_exif_roundtrip_property(ifd0, exif, bo):
    """ANY entry set (both endiannesses, inline and spilled values,
    every supported type, optional EXIF sub-IFD) must walk back to
    exactly the written tag/type/count/value rows — through both the
    raw TIFF blob and the JPEG APP1 carriage."""
    # the writer appends the 0x8769 pointer itself; keep user tags clear
    ifd0 = [e for e in ifd0 if e[0] != 0x8769]
    exif = [e for e in exif if e[0] != 0x8769] if exif else exif
    if not ifd0 or exif == []:
        return
    for payload, rows in (
        (mm.encode_exif(ifd0, exif, bo), None),
        (None, mm.decode_exif_jpeg(mm.encode_exif_jpeg(ifd0, exif, bo))),
    ):
        got = mm.decode_exif(payload) if payload is not None else rows
        by = {(ifd, tag): (typ, val) for ifd, tag, typ, _c, val in got}
        for tag, typ, values in ifd0:
            assert by[("IFD0", tag)] == (typ, _exif_expect(tag, typ, values))
        for tag, typ, values in (exif or []):
            assert by[("EXIF", tag)] == (typ, _exif_expect(tag, typ, values))
        n_exp = len(ifd0) + (len(exif) + 1 if exif else 0)
        assert len(got) == n_exp


def test_exif_malformed_rejection():
    import pytest

    good = mm.encode_exif([(0x0112, 3, [1])])
    with pytest.raises(ValueError):
        mm.decode_exif(b"XX" + good[2:])          # bad byte order
    with pytest.raises(ValueError):
        mm.decode_exif(good[:6])                   # truncated header
    with pytest.raises(ValueError):
        mm.decode_exif(good[:-3])                  # truncated IFD
    with pytest.raises(ValueError):
        mm.decode_exif_jpeg(b"\xff\xd8\xff\xd9")   # JPEG without APP1
    with pytest.raises(ValueError):
        mm.decode_exif_jpeg(b"PNG...")             # not a JPEG


_ID3_TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF,
                           exclude_characters="\x00"),
    min_size=0, max_size=40,
)


@settings(max_examples=50, deadline=None)
@given(
    frames=st.lists(
        st.tuples(
            st.text(alphabet="ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
                    min_size=3, max_size=3).map(lambda s: "T" + s),
            _ID3_TEXT,
        ),
        min_size=1, max_size=6,
    ),
    trailer=st.binary(min_size=0, max_size=32),
)
def test_id3v2_roundtrip_property(frames, trailer):
    """ANY UTF-8 text-frame set must walk back exactly, and the
    synchsafe tag size must bound the walk so trailing MPEG bytes are
    never read as frames."""
    tagged = mm.encode_id3v2(frames, trailer)
    got = mm.decode_id3v2(tagged)
    assert got == frames
    assert mm._skip_id3v2(tagged) == trailer


def test_id3v2_malformed_rejection():
    import pytest

    good = mm.encode_id3v2([("TIT2", "x")])
    with pytest.raises(ValueError):
        mm.decode_id3v2(b"NOT")
    with pytest.raises(ValueError):
        mm.decode_id3v2(good[:8])                     # truncated header
    with pytest.raises(NotImplementedError):
        mm.decode_id3v2(b"ID3\x02\x00\x00\x00\x00\x00\x00")  # v2.2
    bad = bytearray(good)
    bad[9] = 0x7F  # declared size past end
    with pytest.raises(ValueError):
        mm.decode_id3v2(bytes(bad))
    utf16 = bytearray(good)
    utf16[20] = 1  # encoding byte -> UTF-16
    with pytest.raises(NotImplementedError):
        mm.decode_id3v2(bytes(utf16))
