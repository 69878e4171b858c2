"""Property-based tests (hypothesis) — mirrors the reference's proptest
suites (tests/property_tests.rs)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from probe_ray.codec import decode_postings, encode_postings, merge_encoded
from probe_ray.stemmer import stem
from probe_ray.tokenizer import split_camel_case, tokenize


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1,
                max_size=512, unique=True),
       st.data())
@settings(max_examples=60, deadline=None)
def test_codec_roundtrip_property(ids, data):
    ids = sorted(ids)
    tfs = [data.draw(st.integers(min_value=0, max_value=255)) for _ in ids]
    blob, skip, bmax = encode_postings(
        np.array(ids, dtype=np.uint64), np.array(tfs, dtype=np.uint8)
    )
    got_ids, got_tfs = decode_postings(blob)
    assert got_ids.tolist() == ids
    assert got_tfs.tolist() == tfs


@given(st.lists(st.lists(st.integers(min_value=0, max_value=10**6),
                         min_size=1, max_size=50, unique=True),
                min_size=1, max_size=4))
@settings(max_examples=40, deadline=None)
def test_codec_merge_property(id_lists):
    # make lists disjoint (as the build guarantees per (term, doc))
    seen = set()
    lists = []
    for ids in id_lists:
        ids = sorted(set(ids) - seen)
        if ids:
            seen.update(ids)
            lists.append(ids)
    if not lists:
        return
    blobs = [
        encode_postings(np.array(l, dtype=np.uint64),
                        np.ones(len(l), dtype=np.uint8))[0]
        for l in lists
    ]
    merged_ids, _ = decode_postings(merge_encoded(blobs)[0])
    assert merged_ids.tolist() == sorted(seen)


_word = st.text(alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_", min_size=1, max_size=20)


@given(st.lists(_word, min_size=0, max_size=20))
@settings(max_examples=80, deadline=None)
def test_tokenize_deterministic_and_deduped(words):
    text = " ".join(words)
    a = tokenize(text)
    b = tokenize(text)
    assert a == b  # deterministic
    assert len(a) == len(set(a))  # dedup with first-appearance order
    assert all(t == t.lower() for t in a)  # lowercase output


@given(_word)
@settings(max_examples=120, deadline=None)
def test_camel_split_covers_input(word):
    parts = split_camel_case(word)
    # concatenated parts contain exactly the input's characters (lowercased)
    # for the pure state-machine path; cached/exception splits may reorder,
    # so only assert non-emptiness + lowercase
    assert parts == [] or all(p == p.lower() for p in parts)


@given(_word.map(str.lower))
@settings(max_examples=120, deadline=None)
def test_stemmer_total_and_idempotent_on_short(word):
    s = stem(word)
    assert isinstance(s, str) and s
    assert len(s) <= len(word) + 1  # step 1b may append an 'e'


@given(st.text(max_size=300))
@settings(max_examples=60, deadline=None)
def test_tokenize_never_crashes(text):
    tokens = tokenize(text)
    assert isinstance(tokens, list)
