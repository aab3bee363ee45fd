"""Segment codecs: byte4 norms and compressed postings formats.

Registry keyed by name (stored in segment meta.json) so the format can
evolve — the Ray-side analogue of Lucene's ``Codec.forName`` SPI
([U] lucene/core/.../codecs/Codec.java; SURVEY.md §2.11).
"""

from lucene_solr_ray.codec import postings as _postings

POSTINGS_CODECS = {
    "for128-v1": _postings.For128Codec,
    "varint-v1": _postings.VarintCodec,
}

DEFAULT_POSTINGS_CODEC = "for128-v1"


def get_postings_codec(name: str):
    try:
        return POSTINGS_CODECS[name]
    except KeyError:
        raise ValueError(f"unknown postings codec {name!r}; known: {sorted(POSTINGS_CODECS)}")
