from pie_ray.normalize import (
    char_shingles,
    entity_key,
    jaccard,
    normalize,
    url_domain,
)


def test_phone_norm():
    assert normalize("PHONE", "(416) 555-0123") == "4165550123"
    assert normalize("PHONE", "+1 416 555 0123") == "4165550123"
    assert normalize("PHONE", "416-555-0123") == "4165550123"


def test_email_norm():
    assert normalize("EMAIL", " John.Smith@Example.COM ") == "john.smith@example.com"


def test_per_norm():
    assert normalize("PER", "  John   Smith ") == "john smith"
    assert entity_key("PER", "john smith") == "per:john smith"


def test_id_addr_norm():
    assert normalize("ID", "ab1234567") == "AB1234567"
    assert normalize("ADDR", "12  Maple  Street,  Salem") == "12 maple street, salem"


def test_url_domain():
    assert url_domain("https://www.Acme3.com/doc9") == "acme3.com"
    assert url_domain("http://user:pw@host.io:8080/p?q#f") == "host.io"
    assert url_domain("acme.org/path") == "acme.org"


def test_shingles_and_jaccard():
    assert char_shingles("ab") == {"ab"}
    assert char_shingles("abcd") == {"abc", "bcd"}
    assert jaccard({"a", "b"}, {"a", "b"}) == 1.0
    assert jaccard({"a"}, {"b"}) == 0.0
    assert abs(jaccard({"a", "b", "c"}, {"b", "c", "d"}) - 0.5) < 1e-12
