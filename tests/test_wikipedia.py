"""WikipediaTokenizer pinned on the reference's WikipediaTokenizerTest
vectors (testSimple, testLinkPhrases, testLinks, and the complete
98-token testHandwritten pin)."""

from __future__ import annotations

from lucene_solr_spark.analysis.wikipedia import wikipedia_tokenize

A = "<ALPHANUM>"


def terms(text):
    return [t for t, _, _ in wikipedia_tokenize(text)]


def types(text):
    return [y for _, y, _ in wikipedia_tokenize(text)]


def posincs(text):
    return [p for _, _, p in wikipedia_tokenize(text)]


def test_simple():
    t = "This is a [[Category:foo]]"
    assert terms(t) == ["This", "is", "a", "foo"]
    assert types(t) == [A, A, A, "c"]
    assert posincs(t) == [1, 1, 1, 1]


def test_link_phrases():
    t = (
        "click [[link here again]] click "
        "[http://lucene.apache.org here again] [[Category:a b c d]]"
    )
    assert terms(t) == [
        "click", "link", "here", "again", "click",
        "http://lucene.apache.org", "here", "again", "a", "b", "c", "d",
    ]
    assert posincs(t) == [1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1]


def test_links():
    t = (
        "[http://lucene.apache.org/java/docs/index.html#news here]"
        " [http://lucene.apache.org/java/docs/index.html?b=c here]"
        " [https://lucene.apache.org/java/docs/index.html?b=c here]"
    )
    assert terms(t) == [
        "http://lucene.apache.org/java/docs/index.html#news", "here",
        "http://lucene.apache.org/java/docs/index.html?b=c", "here",
        "https://lucene.apache.org/java/docs/index.html?b=c", "here",
    ]
    assert types(t) == ["elu", "el", "elu", "el", "elu", "el"]


def test_handwritten_complete():
    test = (
        "[[link]] This is a [[Category:foo]] Category  This is a linked "
        "[[:Category:bar none withstanding]] "
        "Category This is (parens) This is a [[link]]  This is an external "
        "URL [http://lucene.apache.org] "
        "Here is ''italics'' and ''more italics'', '''bold''' and "
        "'''''five quotes''''' "
        " This is a [[link|display info]]  This is a period.  Here is $3.25 "
        "and here is 3.50.  Here's Johnny.  "
        "==heading== ===sub head=== followed by some text  "
        "[[Category:blah| ]] "
        "''[[Category:ital_cat]]''  here is some that is ''italics "
        "[[Category:foo]] but is never closed."
        "'''same [[Category:foo]] goes for this '''''and2 [[Category:foo]] "
        "and this"
        " [http://foo.boo.com/test/test/ Test Test] "
        "[http://foo.boo.com/test/test/test.html Test Test]"
        " [http://foo.boo.com/test/test/test.html?g=b&c=d Test Test] "
        '<ref>Citation</ref> <sup>martian</sup> <span class="glue">code</span>'
    )
    want_terms = [
        "link", "This", "is", "a", "foo", "Category", "This", "is", "a",
        "linked", "bar", "none", "withstanding", "Category", "This", "is",
        "parens", "This", "is", "a", "link", "This", "is", "an", "external",
        "URL", "http://lucene.apache.org", "Here", "is", "italics", "and",
        "more", "italics", "bold", "and", "five", "quotes", "This", "is",
        "a", "link", "display", "info", "This", "is", "a", "period", "Here",
        "is", "3.25", "and", "here", "is", "3.50", "Here's", "Johnny",
        "heading", "sub", "head", "followed", "by", "some", "text", "blah",
        "ital", "cat", "here", "is", "some", "that", "is", "italics", "foo",
        "but", "is", "never", "closed", "same", "foo", "goes", "for",
        "this", "and2", "foo", "and", "this",
        "http://foo.boo.com/test/test/", "Test", "Test",
        "http://foo.boo.com/test/test/test.html", "Test", "Test",
        "http://foo.boo.com/test/test/test.html?g=b&c=d", "Test", "Test",
        "Citation", "martian", "code",
    ]
    want_types = [
        "il", A, A, A, "c", A, A, A, A, A, "c", "c", "c", A, A, A, A, A, A,
        A, "il", A, A, A, A, A, "elu", A, A, "i", A, "i", "i", "b", A,
        "bi", "bi", A, A, A, "il", "il", "il", A, A, A, A, A, A, "<NUM>",
        A, A, A, "<NUM>", "<APOSTROPHE>", A, "h", "sh", "sh", A, A, A, A,
        "c", "c", "c", A, A, A, A, A, "i", "c", A, A, A, A, "b", "c", A,
        A, A, "bi", "c", A, A, "elu", "el", "el", "elu", "el", "el", "elu",
        "el", "el", "ci", A, A,
    ]
    got = wikipedia_tokenize(test)
    assert [t for t, _, _ in got] == want_terms
    assert [y for _, y, _ in got] == want_types
