"""Property-based checks for URL canonicalization: random structured
URLs through functions/web.py must match a pure-Python reference model,
and canonicalization must be idempotent (canon(canon(u)) == canon(u) —
a re-crawled canonical URL maps to itself, the invariant URL-dedup
relies on)."""

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from arcane_framework_scala_spark.functions import web

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

scheme = st.sampled_from(["http", "HTTP", "https", "HTTPS"])
userinfo = st.sampled_from(["", "bob@", "user:pa55@"])
host = st.sampled_from(
    ["Ex.COM", "www.ex.com", "WWW.a.b.Ex.org", "localhost",
     "api.news.co.uk", "[::1]", "[2001:DB8::1]"]
)
port = st.sampled_from(["", ":80", ":443", ":8080"])
path = st.sampled_from(["", "/", "/a", "/a/b", "/a/b/", "/a//", "/a%20b"])
param = st.sampled_from(
    ["a=1", "b=2", "z=9", "utm_source=x", "UTM_CAMPAIGN=y",
     "utm_source_platform=web", "fbclid=q", "ref=r", "id=3"]
)
query = st.lists(param, max_size=4).map(
    lambda ps: "?" + "&".join(ps) if ps else ""
)
frag = st.sampled_from(["", "#f", "#a/b?c=1"])

url = st.builds(
    lambda s, u, h, po, pa, q, f: f"{s}://{u}{h}{po}{pa}{q}{f}",
    scheme, userinfo, host, port, path, query, frag,
)

_TRACK = re.compile(web.TRACKING_PARAM_RE)


def _model(u: str) -> str:
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)", u)
    sch, auth, pth = m.group(1).lower(), m.group(2), m.group(3)
    hostauth = re.sub(r"^[^@/]*@", "", auth)
    if hostauth.startswith("["):
        bm = re.match(r"^(\[[^\]]*\])", hostauth)
        hst = bm.group(1).lower() if bm else ""
    else:
        hm = re.match(r"^([^:]*)", hostauth)
        hst = re.sub(r"^www\.", "", hm.group(1).lower())
    pm = re.search(r":([0-9]+)$", hostauth)
    prt = pm.group(1) if pm else ""
    if (sch, prt) in (("https", "443"), ("http", "80")):
        prt = ""
    pth = re.sub(r"/+$", "", pth)
    # anchored like the engine (r7 fix): the query starts at the first
    # '?' only if it occurs before any '#'; a '?' inside the fragment
    # (e.g. #a/b?c=1) is NOT a query
    qm = re.match(r"^[^#?]*\?([^#]*)", u)
    q = qm.group(1) if qm else ""
    kept = sorted(p for p in q.split("&") if p and not _TRACK.match(p))
    out = f"{sch}://{hst}"
    if prt:
        out += f":{prt}"
    out += pth
    if kept:
        out += "?" + "&".join(kept)
    return out


@settings(**_SETTINGS)
@given(urls=st.lists(url, min_size=1, max_size=8))
def test_canonicalize_matches_model(spark, urls):
    df = spark.createDataFrame(
        list(enumerate(urls)), "doc_id long, url string"
    )
    got = {
        r["url"]: r["canon_url"]
        for r in web.url_canonicalize(df).collect()
    }
    for u in urls:
        assert got[u] == _model(u), u


@settings(**_SETTINGS)
@given(urls=st.lists(url, min_size=1, max_size=8))
def test_canonicalize_is_idempotent(spark, urls):
    canon = [_model(u) for u in urls]
    df = spark.createDataFrame(
        list(enumerate(canon)), "doc_id long, url string"
    )
    for r in web.url_canonicalize(df).collect():
        assert r["canon_url"] == r["url"], r["url"]
