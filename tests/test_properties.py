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


def test_decode_postings_selective_matches_full():
    """Skip-pointer selective decode returns exactly the blocks containing
    wanted ids, with values identical to the full decode (block-boundary
    cases: 1, 127, 128, 129, 1000 postings; salted-style sublists)."""
    import numpy as np

    from probe_ray import codec

    rng = np.random.default_rng(11)
    for n in (1, 2, 127, 128, 129, 300, 1000):
        ids = np.unique(rng.integers(0, n * 37, size=n).astype(np.uint64))
        tfs = rng.integers(1, 16, size=ids.size).astype(np.uint8)
        blob, skip, _ = codec.encode_postings(ids, tfs)
        full_ids, full_tfs = codec.decode_postings(blob)
        assert np.array_equal(full_ids, ids)
        # wanted: a few present ids + a few absent
        want = np.unique(
            np.concatenate(
                [ids[:: max(1, ids.size // 7)].astype(np.int64),
                 np.array([0, int(ids.max()) + 5], dtype=np.int64)]
            )
        )
        sel_ids, sel_tfs = codec.decode_postings_selective(blob, skip, want)
        # every wanted id that exists must be present with the right tf
        tf_by_id = dict(zip(full_ids.tolist(), full_tfs.tolist()))
        sel_map = dict(zip(sel_ids.tolist(), sel_tfs.tolist()))
        for w in want.tolist():
            if w in tf_by_id:
                assert sel_map[w] == tf_by_id[w], (n, w)
        # selected ids are a SUBSET of the full list (no corruption)
        assert set(sel_ids.tolist()) <= set(full_ids.tolist())
        # and the selection reads fewer (or equal) blocks than the total
        assert sel_ids.size <= full_ids.size


def test_fallback_windows_properties():
    """Invariants of the fallback window merger for random inputs:
    windows sorted, non-overlapping after merge, every matched line inside
    exactly one window, spans clamped to the file."""
    import random

    from probe_ray.blocks import fallback_windows

    rng = random.Random(5)
    for _ in range(200):
        n_lines = rng.randint(1, 120)
        matched = {
            rng.randint(1, n_lines) for _ in range(rng.randint(1, 12))
        }
        ws = fallback_windows(matched, n_lines)
        assert ws == sorted(ws, key=lambda w: w[1])
        prev_end = 0
        covered = set()
        for lines, start, end in ws:
            assert 1 <= start <= end <= n_lines
            assert start > prev_end  # merged windows never overlap
            prev_end = end
            for l in lines:
                assert start <= l <= end
            covered.update(lines)
        assert covered == {l for l in matched if l <= n_lines}


def test_line_term_matches_matches_naive_property():
    import random

    from probe_ray.blocks import line_term_matches

    rng = random.Random(9)
    alphabet = "abcx _()"
    for _ in range(150):
        lines = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 20)))
                 for _ in range(rng.randint(1, 10))]
        pats = {
            i: ["".join(rng.choice("abc") for _ in range(rng.randint(1, 3)))]
            for i in range(rng.randint(1, 4))
        }
        fast = line_term_matches(lines, pats)
        low = [l.lower() for l in lines]
        slow = {}
        for idx, needles in pats.items():
            hit = {n + 1 for n, ll in enumerate(low) if any(p in ll for p in needles)}
            if hit:
                slow[idx] = hit
        assert fast == slow


# code-ish text generator: lines drawn from keywords, braces, quotes,
# comments and identifiers — hostile to a regex/brace scanner without
# being pure noise
_code_line = st.text(
    alphabet=(
        "abcdefXYZ0129_ \t(){}[];:,.\"'`#/\\*=<>-+!?@$&|~\n"
        "defclassfnpubfuncifelseendmodulereturn"
    ),
    max_size=60,
)


@given(st.lists(_code_line, min_size=0, max_size=30),
       st.sampled_from(["rs", "py", "go", "js", "ts", "java", "c", "cpp",
                        "cs", "rb"]))
@settings(max_examples=120, deadline=None)
def test_structparse_never_crashes_and_spans_in_bounds(lines, ext):
    """structparse invariants on ARBITRARY text for all ten languages:
    never raises, scan preserves line count and lengths, every span is a
    well-formed 1-based range inside the file, and analysis is
    deterministic."""
    from probe_ray import structparse as sp

    flat = [l.replace("\n", " ") for l in lines]  # lines are single lines
    code, comment_only, in_str = sp.scan_lines(flat, ext)
    assert len(code) == len(flat)
    assert all(len(c) == len(l) for c, l in zip(code, flat))
    spans = sp.structural_spans(flat, ext)
    for s in spans:
        assert 1 <= s.start <= s.end <= max(len(flat), 1), (s, ext)
    assert spans == sp.structural_spans(flat, ext)
