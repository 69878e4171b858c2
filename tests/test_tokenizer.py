"""Tokenizer + stemmer golden tests ported from the reference's own unit
tests (tokenization.rs:2852-2959, ranking.rs tests)."""

from probe_ray.stemmer import stem
from probe_ray.tokenizer import (
    split_camel_case,
    split_compound_word,
    tokenize,
)


def test_split_camel_case_goldens():
    assert split_camel_case("camelCase") == ["camel", "case"]
    assert split_camel_case("PascalCase") == ["pascal", "case"]
    assert split_camel_case("parseJSONToHTML5") == ["parse", "json", "to", "html", "5"]
    assert split_camel_case("APIDefinition") == ["api", "definition"]
    assert split_camel_case("OAuth2Provider") == ["oauth2", "provider"]
    assert split_camel_case("typeIgnore") == ["type", "ignore"]
    assert split_camel_case("migrateEndpointMetaByType") == [
        "migrate", "endpoint", "meta", "by", "type",
    ]
    # all-lowercase compound splits via the precomputed cache
    assert split_camel_case("codeblock") == ["code", "block"]
    assert split_camel_case("codeblocks") == ["code", "blocks"]
    assert split_camel_case("parsefile") == ["parse", "file"]
    assert split_camel_case("filename") == ["file", "name"]
    assert split_camel_case("filepath") == ["file", "path"]


def test_tokenize_goldens():
    t = tokenize("func (a *APIDefinition) MigrateEndpointMeta()")
    for x in ["api", "definit", "migrat", "meta"]:
        assert x in t
    assert ("endpoint" in t) or ("end" in t and "point" in t)

    t = tokenize("func ParseJSONToHTML5()")
    for x in ["pars", "json", "html"]:
        assert x in t
    assert "5" not in t  # integers 0-10 are stop words

    t = tokenize("typeIgnore typeWhitelist")
    assert "ignor" in t

    t = tokenize("whitelist blackmail firewall")
    for x in ["whitelist", "black", "mail", "firewall"]:
        assert x in t

    t = tokenize("enableFirewallWhitelist")
    for x in ["enabl", "firewall", "whitelist"]:
        assert x in t


def test_tokenize_dedup_and_order():
    assert tokenize("alpha alpha beta alpha") == ["alpha", "beta"]


def test_negated_terms_excluded():
    # a leading '-' marks the word's tokens negated (tokenization.rs:2742-2778)
    t = tokenize("-gamma alpha gamma")
    assert "gamma" not in t
    assert "alpha" in t


def test_dynamic_special_terms():
    specials = frozenset({"keywordgamma"})
    assert tokenize("keywordGamma", specials) == ["keywordgamma"]
    assert tokenize("keywordGamma") == ["key", "word", "gamma"]


def test_special_case_never_split():
    assert split_camel_case("whitelist") == ["whitelist"]
    assert tokenize("oauth2") == ["oauth2"]
    assert tokenize("GraphQLSchema") == ["graphql", "schema"]


def test_split_compound_word_skip_heuristics():
    # < 6 chars skip compound processing (returns word as-is)
    assert split_compound_word("block") == ["block"]
    # critical programming terms are never skipped
    assert split_compound_word("api") == ["api"]


def test_stemmer_reference_goldens():
    cases = {
        "definition": "definit", "migrate": "migrat", "parse": "pars",
        "ignore": "ignor", "enable": "enabl", "repository": "repositori",
        "whitelisting": "whitelist", "running": "run", "caresses": "caress",
        "ties": "tie", "agreed": "agre", "happy": "happi", "electriciti": "electr",
        "news": "news", "dying": "die", "communism": "communism",
    }
    for word, expected in cases.items():
        assert stem(word) == expected, (word, stem(word), expected)


def test_stopwords():
    from probe_ray.tokenizer import is_english_stop_word, is_stop_word

    assert is_stop_word("func") and is_stop_word("type") and is_stop_word("struct")
    assert not is_stop_word("migrate") and not is_stop_word("endpoint")
    assert is_english_stop_word("5") and is_english_stop_word("10")
    assert not is_english_stop_word("11")
