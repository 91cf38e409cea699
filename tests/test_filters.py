"""Rule-based web filters (engine/filters.py)."""

from __future__ import annotations

import pyarrow as pa

from engine.filters import banned_word_gate, url_rule_filter


def _verdicts(urls):
    import ray.data as rd

    out = url_rule_filter(
        rd.from_items([{"url": u} for u in urls])).to_pandas()
    return dict(zip(out["url"], zip(out["keep"], out["reason"])))


def test_url_rules(ray_session):
    v = _verdicts([
        "https://ok.example.com/a/p1",
        "https://bad.xxx/p2",
        "https://w.example.com/casino/p3",
        "https://d.example.com/a/b/c/d/e/f/g/p4",          # 8 slashes
        "https://q.example.com/p?a=1&b=2&c=3&d=4&e=5&f=6",  # 5 '&'
        "https://long.example.com/" + "y" * 200,
        "https://mix.xxx/casino/p5",      # tld precedence over word
        "https://sub.xxx.example.com/p6",  # '.xxx.' mid-host: NOT a tld hit
        "https://deep.example.com/a/b/c/d/e/f?x=1&y=2",  # 6 slashes, 1 '&'
    ])
    assert v["https://ok.example.com/a/p1"] == (True, "")
    assert v["https://bad.xxx/p2"] == (False, "tld")
    assert v["https://w.example.com/casino/p3"] == (False, "word")
    assert v["https://d.example.com/a/b/c/d/e/f/g/p4"] == (False, "depth")
    assert v["https://q.example.com/p?a=1&b=2&c=3&d=4&e=5&f=6"] == (
        False, "query")
    assert v["https://long.example.com/" + "y" * 200] == (False, "len")
    assert v["https://mix.xxx/casino/p5"] == (False, "tld")
    # mid-host banned-tld substring is a 'word' hit (xxx), not 'tld'
    assert v["https://sub.xxx.example.com/p6"] == (False, "word")
    assert v["https://deep.example.com/a/b/c/d/e/f?x=1&y=2"] == (True, "")


def test_banned_word_gate(ray_session):
    import ray.data as rd

    rows = [
        {"doc_id": 0, "text": "clean words only here"},          # 0/4
        {"doc_id": 1, "text": "slow scan merge slow"},           # 4/4
        {"doc_id": 2, "text": "slow " + "pad " * 39},            # 1/40 = 25/1000
        {"doc_id": 3, "text": "slowly scanning merged"},         # substrings: 0 hits
        {"doc_id": 4, "text": ""},                                # 0/0
    ]
    out = banned_word_gate(rd.from_items(rows), ("slow", "scan", "merge"),
                           max_per_1000=100).to_pandas()
    got = {r.doc_id: (r.n_tokens, r.n_banned, r.keep)
           for r in out.itertuples()}
    assert got[0] == (4, 0, True)
    assert got[1] == (4, 4, False)
    assert got[2] == (40, 1, True)
    assert got[3] == (3, 0, True)   # \b word boundaries, not substrings
    assert got[4] == (0, 0, True)


def test_parallelism_invariance(ray_session):
    import ray.data as rd

    rows = [{"doc_id": i,
             "text": ("slow word " * (i % 7) + "pad " * (i % 11)).strip()}
            for i in range(100)]
    a = (banned_word_gate(rd.from_items(rows).repartition(1),
                          ("slow",), 50)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (banned_word_gate(rd.from_items(rows).repartition(13),
                          ("slow",), 50)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)


def test_banned_words_are_regex_escaped(ray_session):
    import ray.data as rd

    rows = [{"doc_id": 0, "text": "axb normal"},
            {"doc_id": 1, "text": "a.b normal"}]
    out = (banned_word_gate(rd.from_items(rows), ("a.b",), 0)
           .to_pandas().set_index("doc_id"))
    assert out.loc[0, "n_banned"] == 0   # '.' is literal, not wildcard
    assert out.loc[1, "n_banned"] == 1


def test_parse_robots_rules(ray_session):
    import ray.data as rd

    from engine.filters import parse_robots_rules

    robots = rd.from_arrow(pa.table({
        "host": ["h1", "h2", "h3", "h4"],
        "robots_txt": [
            # star group after an irrelevant group; comment; empty
            # Disallow ignored; trailing-* stripped; mid-* dropped
            "# hi\nUser-agent: otherbot\nDisallow: /\n\n"
            "User-agent: helper\nUser-agent: *\nDisallow: /private\n"
            "Allow: /private/pub\nDisallow: /tmp*\nDisallow:\n"
            "Disallow: /a*b\nDisallow: /end$\n",
            # specific group overrides star
            "User-agent: MyBot\nDisallow: /only\nUser-agent: *\n"
            "Disallow: /\n",
            # no applicable group
            "User-agent: spider\nDisallow: /x\n",
            # rules before any group are orphans (ignored)
            "Disallow: /orphan\nUser-agent: *\nDisallow: /real\n",
        ],
    }))
    out = parse_robots_rules(robots, "mybot").to_pandas()
    got = {(r.host, r.rule, r.allow) for r in out.itertuples()}
    assert got == {
        ("h1", "/private", 0), ("h1", "/private/pub", 1), ("h1", "/tmp", 0),
        ("h2", "/only", 0),
        ("h4", "/real", 0),
    }
    assert all(out["rlen"] == out["rule"].str.len())


def test_robots_gate(ray_session):
    import ray.data as rd

    from engine.filters import parse_robots_rules, robots_gate

    robots = rd.from_arrow(pa.table({
        "host": ["h1"],
        "robots_txt": ["User-agent: *\nDisallow: /private\n"
                       "Allow: /private/pub\nDisallow: /private/pub/no\n"],
    }))
    rules = parse_robots_rules(robots, "mybot").materialize()
    urls = rd.from_arrow(pa.table({"url": [
        "https://h1/private/a",      # disallowed
        "https://h1/private/pub/a",  # allow (longer)
        "https://h1/private/pub/no/x",  # disallow (longest)
        "https://h1/open",           # no rule
        "https://h1",                # empty path -> '/', no rule matches
        "https://OTHER/x",           # unknown host
    ]}))
    out = robots_gate(urls, rules).to_pandas().set_index("url")["allowed"]
    assert out["https://h1/private/a"] == 0
    assert out["https://h1/private/pub/a"] == 1
    assert out["https://h1/private/pub/no/x"] == 0
    assert out["https://h1/open"] == 1
    assert out["https://h1"] == 1
    assert out["https://OTHER/x"] == 1
