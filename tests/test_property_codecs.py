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
