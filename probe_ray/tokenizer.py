"""Code-aware tokenizer reproducing the reference's semantics exactly.

This is a from-scratch Python implementation of the tokenization pipeline in
/root/reference/src/search/tokenization.rs (see SURVEY.md §2.1). Every rule is
cited. It is the single most fidelity-critical module: document frequencies,
document lengths and therefore every BM25 score derive from it.

Key reference behaviors reproduced:

- ``tokenize``: whitespace split -> non-alphanumeric split (leading ``-``
  marks tokens negated) -> camelCase split -> stop-word removal -> compound
  split -> stemming -> dedup preserving first-appearance order
  (tokenization.rs:2728-2850).
- ``split_camel_case``: special-case words, oauth2 prefix, special-case
  prefixes longest-first, precomputed compound splits + exception-term
  substring splits for all-lowercase inputs, then the state machine with
  lower->upper / digit boundaries / upper-run->Upper+lower boundaries
  (tokenization.rs:1936-2081).
- ``split_compound_word_cached`` (the variant the tokenize pipeline uses):
  special case -> exception term -> whole-word vocabulary -> filtering cache
  -> precomputed cache -> decompound fallback (tokenization.rs:762-812).
  NOTE: unlike ``split_compound_word`` (2117-2179) this variant does NOT
  apply the should_skip_compound_processing heuristic.
- Dynamic special terms (quoted-exact / excluded query keywords) are
  query-scoped state in the reference (tokenization.rs:845-879). Ray workers
  share no globals, so they are passed explicitly as the ``specials``
  frozenset through every function.

Determinism note: the reference iterates EXCEPTION_TERMS (a HashSet) when
splitting all-lowercase identifiers (tokenization.rs:2001-2023), which is
per-process-arbitrary for words containing several exception terms. We fix
the source-code order of term_exceptions.rs:6-60 (wordlists.EXCEPTION_TERMS
is an ordered tuple) so results are deterministic across the cluster.
"""

from __future__ import annotations

from functools import lru_cache

from probe_ray.stemmer import stem
from probe_ray.wordlists import (
    COMMON_NON_COMPOUND_WORDS,
    CRITICAL_PROGRAMMING_TERMS,
    ENGLISH_STOP_WORDS,
    EXCEPTION_TERMS,
    FILTERING_COMPOUND_CACHE,
    PRECOMPUTED_COMPOUND_SPLITS,
    PROGRAMMING_STOP_WORDS,
    SPECIAL_CASE_WORDS,
    VOCABULARY,
)

EMPTY: frozenset[str] = frozenset()

# Special-case words sorted longest-first for the prefix scan
# (tokenization.rs:1966-1970). Ties broken alphabetically for determinism
# (the reference's tie order is HashSet-arbitrary).
_SPECIAL_CASES_BY_LEN = tuple(sorted(SPECIAL_CASE_WORDS, key=lambda w: (-len(w), w)))

# first-char index over the prefix list: most words fail the scan on the
# first character, so index by it (hot-path optimization, same semantics)
_SPECIAL_BY_FIRST: dict[str, tuple[str, ...]] = {}
for _w in _SPECIAL_CASES_BY_LEN:
    _SPECIAL_BY_FIRST.setdefault(_w[0], ())
    _SPECIAL_BY_FIRST[_w[0]] = _SPECIAL_BY_FIRST[_w[0]] + (_w,)

_EXCEPTION_TERMS_SET = frozenset(EXCEPTION_TERMS)


def is_english_stop_word(word: str) -> bool:
    """English stop words plus integers 0-10 (tokenization.rs:2084-2093)."""
    if word.isdigit():
        try:
            if int(word) <= 10:
                return True
        except ValueError:
            pass
    return word in ENGLISH_STOP_WORDS


def is_stop_word(word: str) -> bool:
    return is_english_stop_word(word) or word in PROGRAMMING_STOP_WORDS


def is_special_case(word: str, specials: frozenset[str] = EMPTY) -> bool:
    """Static special-case words plus query-scoped dynamic special terms
    (tokenization.rs:1195-1239)."""
    lower = word.lower()
    return lower in SPECIAL_CASE_WORDS or lower in specials


def is_exception_term(word: str) -> bool:
    return word.lower() in _EXCEPTION_TERMS_SET


def _decompound(word: str, valid) -> list[str]:
    """Full decomposition into vocabulary words, longest-prefix-first.

    Stands in for the reference's external ``decompound`` crate fallback
    (tokenization.rs:798-803). Only reached for words that escaped every
    cache/list; requires >= 2 parts, each accepted by ``valid``.
    """
    n = len(word)

    def rec(start: int) -> list[str] | None:
        if start == n:
            return []
        for end in range(n, start, -1):
            part = word[start:end]
            if valid(part):
                rest = rec(end)
                if rest is not None:
                    return [part] + rest
        return None

    for end in range(n - 1, 0, -1):
        head = word[:end]
        if valid(head):
            rest = rec(end)
            if rest is not None:
                return [head] + rest
    return [word]


def split_camel_case(input_word: str, specials: frozenset[str] = EMPTY) -> list[str]:
    """Port of split_camel_case_with_config (tokenization.rs:1936-2081),
    scalar semantics."""
    if not input_word:
        return []
    if is_special_case(input_word, specials):
        return [input_word.lower()]

    lowercase = input_word.lower()

    # OAuth2Provider -> ["oauth2", "provider"] (tokenization.rs:1957-1964)
    if lowercase.startswith("oauth2"):
        remaining = input_word[6:]
        if remaining:
            return ["oauth2"] + split_camel_case(remaining, specials)

    # Longest-first special-case prefixes (tokenization.rs:1966-1985);
    # first-char indexed, same longest-first order within a bucket
    for special in _SPECIAL_BY_FIRST.get(lowercase[:1], ()):
        if lowercase.startswith(special):
            remaining = input_word[len(special):]
            if remaining:
                return [special] + split_camel_case(remaining, specials)

    # All-lowercase identifiers: precomputed splits then exception-term
    # substring splits (tokenization.rs:1989-2023)
    if input_word == lowercase and "_" not in input_word and len(input_word) > 3:
        cached = PRECOMPUTED_COMPOUND_SPLITS.get(lowercase)
        if cached is not None:
            return list(cached)
        for term in EXCEPTION_TERMS:
            if term in input_word and term != input_word:
                parts = input_word.split(term)
                if len(parts) > 1:
                    result = []
                    for i, part in enumerate(parts):
                        if part:
                            result.append(part)
                        if i < len(parts) - 1:
                            result.append(term)
                    if result:
                        return result

    # State machine (tokenization.rs:2028-2075)
    result: list[str] = []
    current: list[str] = []
    prev_is_lower = prev_is_upper = prev_is_digit = False
    chars = input_word
    n = len(chars)
    for i in range(n):
        c = chars[i]
        is_upper = "A" <= c <= "Z"
        is_lower = "a" <= c <= "z"
        is_digit = "0" <= c <= "9"
        if current and (
            (prev_is_lower and is_upper)
            or (prev_is_digit != is_digit)
            or (
                prev_is_upper
                and is_upper
                and i + 1 < n
                and "a" <= chars[i + 1] <= "z"
            )
        ):
            result.append("".join(current))
            current = []
        current.append(c)
        prev_is_lower, prev_is_upper, prev_is_digit = is_lower, is_upper, is_digit
    if current:
        result.append("".join(current))
    return [w.lower() for w in result]


def _vocab_valid(part: str) -> bool:
    return part.lower() in VOCABULARY


@lru_cache(maxsize=65536)
def _split_compound_cached_static(word: str) -> tuple[str, ...]:
    """split_compound_word_cached with no dynamic specials
    (tokenization.rs:762-812), cacheable per worker."""
    lower = word.lower()
    if lower in SPECIAL_CASE_WORDS:
        return (lower,)
    if lower in _EXCEPTION_TERMS_SET:
        return (word,)
    if lower in VOCABULARY:
        return (word,)
    hit = FILTERING_COMPOUND_CACHE.get(lower)
    if hit is not None:
        return tuple(hit)
    hit = PRECOMPUTED_COMPOUND_SPLITS.get(lower)
    if hit is not None:
        return tuple(hit)
    return tuple(_decompound(word, _vocab_valid))


def split_compound_word_for_filtering(
    word: str, specials: frozenset[str] = EMPTY
) -> list[str]:
    if specials and word.lower() in specials:
        return [word.lower()]
    return list(_split_compound_cached_static(word))


def split_compound_word(word: str, specials: frozenset[str] = EMPTY) -> list[str]:
    """Port of split_compound_word (tokenization.rs:2117-2179): the variant
    WITH the skip heuristic; used for query-term compound matching in block
    stats (file_processing.rs:1444-1459 goes through the filtering variant,
    this one is exposed for completeness/tests)."""
    if _should_skip_compound_processing(word):
        return [word]
    if is_special_case(word, specials):
        return [word.lower()]
    lower = word.lower()
    if lower in _EXCEPTION_TERMS_SET:
        return [word]
    if lower in VOCABULARY:
        return [word]
    hit = PRECOMPUTED_COMPOUND_SPLITS.get(lower)
    if hit is not None:
        return list(hit)
    return _decompound(word, _vocab_valid)


def _should_skip_compound_processing(word: str) -> bool:
    """tokenization.rs:1870-1928."""
    lower = word.lower()
    if lower in CRITICAL_PROGRAMMING_TERMS:
        return False
    if len(word) < 6:
        return True
    for c in word:
        if c.isdigit():
            return True
        if 33 <= ord(c) <= 126 and not c.isalnum() and c not in "_-":
            return True
    if lower in COMMON_NON_COMPOUND_WORDS:
        return True
    if len(word) >= 3 and all(c == word[0] for c in word):
        return True
    return False


# per-worker memo: raw whitespace word -> its alnum-run split. Code corpora
# repeat identifiers heavily, so the per-char split loop is paid once per
# DISTINCT word instead of once per occurrence (hot in both index build and
# block extraction).
_WORD_SPLIT_CACHE: dict[str, tuple[str, ...]] = {}
_WORD_SPLIT_CACHE_MAX = 500_000


def _split_word_runs(word: str) -> tuple[str, ...]:
    if word.isalnum():  # fast path: most code words have no separator
        return (word,)
    parts: list[str] = []
    current: list[str] = []
    for c in word:
        if c.isalnum():
            current.append(c)
        elif current:
            parts.append("".join(current))
            current = []
    if current:
        parts.append("".join(current))
    return tuple(parts)


def _split_words(text: str) -> tuple[list[str], set[str]]:
    """Whitespace split then non-alphanumeric split; a leading '-' marks the
    word's tokens negated (tokenization.rs:2741-2780)."""
    tokens: list[str] = []
    negated: set[str] = set()
    cache = _WORD_SPLIT_CACHE
    for word in text.split():
        is_negated = word.startswith("-")
        if is_negated:
            word = word[1:]
        runs = cache.get(word)
        if runs is None:
            runs = _split_word_runs(word)
            if len(cache) < _WORD_SPLIT_CACHE_MAX:
                cache[word] = runs
        tokens.extend(runs)
        if is_negated:
            for tok in runs:
                negated.add(tok.lower())
    return tokens, negated


def _process_token(
    token: str,
    specials: frozenset[str],
    negated: frozenset[str] | set[str],
    processed: set[str],
    result: list[str],
    shadows: list[str] | None = None,
) -> list[str]:
    """Inner loop of tokenize for one raw token (tokenization.rs:2793-2848).
    Appends to result/processed; returns the 'check keys' (every
    intermediate form a negation could veto) for the fast-path cache.

    ``shadows`` (optional) collects word forms that appear in the text but
    are NOT emitted as tokens — stop words and unstemmed originals. The
    index stores them as tf=0 "shadow" postings so that probe's
    substring-based retrieval (a query term hiding inside 'by' or
    'mappings') can be reproduced via term-dictionary expansion without a
    content scan (SURVEY.md §7.4)."""
    keys: list[str] = []
    for part in split_camel_case(token, specials):
        lower_part = part.lower()
        if is_stop_word(lower_part):
            if shadows is not None:
                shadows.append(lower_part)
            continue
        keys.append(lower_part)
        if lower_part in negated:
            continue
        for compound_part in split_compound_word_for_filtering(lower_part, specials):
            if is_stop_word(compound_part):
                if shadows is not None:
                    shadows.append(compound_part)
                continue
            keys.append(compound_part)
            if compound_part in negated:
                continue
            if is_special_case(compound_part, specials):
                if compound_part not in processed:
                    processed.add(compound_part)
                    result.append(compound_part)
                continue  # no stemming for special-case terms
            if compound_part in _EXCEPTION_TERMS_SET and compound_part not in processed:
                processed.add(compound_part)
                result.append(compound_part)
            stemmed = stem(compound_part)
            keys.append(stemmed)
            if stemmed != compound_part and shadows is not None:
                shadows.append(compound_part)  # unstemmed original
            if stemmed in negated:
                continue
            if stemmed not in processed:
                processed.add(stemmed)
                result.append(stemmed)
    return keys


# per-worker cache: raw token -> (emissions assuming no negation applies,
# negation check-keys, shadow forms), keyed by the query-scoped specials
# set (EMPTY = index build / plain queries). Quoted/excluded queries reuse
# the cache for THEIR specials set — identifiers repeat heavily, so each
# distinct raw token pays split_camel_case/stem once per (worker, specials)
# instead of once per occurrence.
_TOKEN_CACHE: dict[str, tuple[tuple[str, ...], frozenset[str], tuple[str, ...]]] = {}
_TOKEN_CACHE_MAX = 500_000
_SPECIAL_TOKEN_CACHES: dict[
    frozenset[str],
    dict[str, tuple[tuple[str, ...], frozenset[str], tuple[str, ...]]],
] = {}
_SPECIAL_TOKEN_CACHES_MAX = 8  # distinct specials sets kept per worker


def tokenize(text: str, specials: frozenset[str] = EMPTY) -> list[str]:
    """Port of tokenize (tokenization.rs:2728-2850).

    Returns the deduplicated (first-appearance order) token list. ``specials``
    is the query-scoped dynamic-special-term set (quoted exact / excluded
    keywords); pass EMPTY when building the static index.
    """
    return tokenize_with_shadows(text, specials)[0]


def tokenize_with_shadows(
    text: str, specials: frozenset[str] = EMPTY
) -> tuple[list[str], list[str]]:
    """tokenize() plus the sorted shadow-form list (stop words / unstemmed
    originals present in the text but absent from the token vector) —
    consumed by the index build for tf=0 shadow postings."""
    raw_tokens, negated = _split_words(text)
    processed: set[str] = set()
    result: list[str] = []
    shadows: list[str] = []

    if specials:
        cache = _SPECIAL_TOKEN_CACHES.get(specials)
        if cache is None:
            if len(_SPECIAL_TOKEN_CACHES) >= _SPECIAL_TOKEN_CACHES_MAX:
                _SPECIAL_TOKEN_CACHES.pop(next(iter(_SPECIAL_TOKEN_CACHES)))
            cache = _SPECIAL_TOKEN_CACHES[specials] = {}
    else:
        cache = _TOKEN_CACHE
    for token in raw_tokens:
        hit = cache.get(token)
        if hit is None:
            sub_processed: set[str] = set()
            sub_result: list[str] = []
            sub_shadows: list[str] = []
            keys = _process_token(
                token, specials, EMPTY, sub_processed, sub_result, sub_shadows
            )
            hit = (tuple(sub_result), frozenset(keys), tuple(sub_shadows))
            if len(cache) < _TOKEN_CACHE_MAX:
                cache[token] = hit
        emissions, keys, tok_shadows = hit
        if negated and not negated.isdisjoint(keys):
            # a negation touches this token: take the exact slow path
            _process_token(token, specials, negated, processed, result, shadows)
            continue
        shadows.extend(tok_shadows)
        for t in emissions:
            if t not in processed:
                processed.add(t)
                result.append(t)
    return result, sorted(set(shadows) - set(result))
