import pyarrow as pa

from xhs_ocr_ray.functions.urls import canonical_url, canonicalize_url_batch


def test_fragment_dropped():
    assert canonical_url("http://a.com/x#sec") == "http://a.com/x"


def test_scheme_host_lowercased_path_kept():
    assert canonical_url("HTTP://WWW.Ex.COM/KeepCase") == \
        "http://www.ex.com/KeepCase"


def test_default_ports_stripped():
    assert canonical_url("http://a.com:80/x") == "http://a.com/x"
    assert canonical_url("https://a.com:443/x") == "https://a.com/x"
    # non-default ports stay; cross-scheme defaults stay
    assert canonical_url("http://a.com:8080/x") == "http://a.com:8080/x"
    assert canonical_url("http://a.com:443/x") == "http://a.com:443/x"


def test_tracking_params_dropped_and_sorted():
    assert canonical_url("http://a.com/x?utm_source=t&b=2&a=1&fbclid=z") == \
        "http://a.com/x?a=1&b=2"
    assert canonical_url("http://a.com/x?gclid=1&ref=top") == "http://a.com/x"
    # 'ref' exact param only — 'referrer' survives
    assert canonical_url("http://a.com/x?referrer=y") == \
        "http://a.com/x?referrer=y"
    # bare '?' and empty params vanish
    assert canonical_url("http://a.com/x?") == "http://a.com/x"
    assert canonical_url("http://a.com/x?&&a=1") == "http://a.com/x?a=1"


def test_empty_path_normalized():
    assert canonical_url("http://a.com") == "http://a.com/"
    assert canonical_url("http://a.com?a=1") == "http://a.com/?a=1"


def test_unparseable_passthrough():
    assert canonical_url("not a url#frag") == "not a url"
    assert canonical_url("") == ""
    assert canonical_url(None) == ""


def test_batch_wrapper():
    b = pa.table({"url": ["HTTP://A.com:80/p#f", None]})
    out = canonicalize_url_batch(b)
    assert out.column("url_canon").to_pylist() == ["http://a.com/p", ""]
