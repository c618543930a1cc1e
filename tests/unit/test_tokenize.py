from pie_ray.stages.tokenize import doc_tokens, sentence_spans, tokenize_sentence


def test_offsets_roundtrip():
    text = "Call Kirkland, Mary on +1 433 288 6757.\nNext line here."
    for toks in doc_tokens(text):
        for tok, b, e in toks:
            assert text[b:e] == tok


def test_newline_is_boundary():
    text = "one two\nthree four"
    spans = sentence_spans(text)
    assert [text[b:e] for b, e in spans] == ["one two", "three four"]


def test_split_on_period_space():
    text = "First sentence. Second sentence."
    spans = sentence_spans(text)
    assert [text[b:e].strip() for b, e in spans] == [
        "First sentence.",
        "Second sentence.",
    ]


def test_initials_do_not_split():
    text = "Contact J. Smith at work. He is here."
    spans = sentence_spans(text)
    got = [text[b:e].strip() for b, e in spans]
    assert got == ["Contact J. Smith at work.", "He is here."]


def test_token_classes():
    toks = [t for t, _, _ in tokenize_sentence("Smith, John a1-b", 0, 16)]
    assert toks == ["Smith", ",", "John", "a", "1", "-", "b"]
