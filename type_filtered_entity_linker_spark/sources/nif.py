"""Minimal NIF 2.0 Turtle adapter — the reference's external API
surface (O2/O4: GERBIL request/response, inout/nif.py:3-49). The
reference round-trips {uri, text, mentions[start,end]} through pynif;
this module implements the same document shape over the NIF core
vocabulary directly (no rdflib in this environment), sufficient for
the GERBIL exchange pattern: a Context with isString, and Phrases with
beginIndex/endIndex/taIdentRef.

In the engine, each NIF request maps to one row of the pages table +
premarked mention spans (D2KB) — see SURVEY.md §3.2; the adapter is
the thin boundary, not a pipeline stage.
"""

from __future__ import annotations

import re

NIF = "http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#"
ITSRDF = "http://www.w3.org/2005/11/its/rdf#"


def _ttl_escape(s: str) -> str:
    return (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


def _ttl_unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            out.append({"n": "\n", "r": "\r", "t": "\t"}.get(n, n))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def generate_nif(doc: dict) -> str:
    """{uri, text, mentions: [{start, end, entity: {item_url, score}
    | None}]} → NIF Turtle (reference generate_nif, inout/nif.py:3-27)."""
    uri, text = doc["uri"], doc["text"]
    n = len(text)
    lines = [
        "@prefix nif: <%s> ." % NIF,
        "@prefix itsrdf: <%s> ." % ITSRDF,
        "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .",
        "",
        "<%s#char=0,%d>" % (uri, n),
        "    a nif:Context, nif:OffsetBasedString ;",
        '    nif:beginIndex "0"^^xsd:nonNegativeInteger ;',
        '    nif:endIndex "%d"^^xsd:nonNegativeInteger ;' % n,
        '    nif:isString "%s" .' % _ttl_escape(text),
    ]
    for m in doc.get("mentions", []):
        s, e = m["start"], m["end"]
        lines += [
            "",
            "<%s#char=%d,%d>" % (uri, s, e),
            "    a nif:Phrase, nif:OffsetBasedString ;",
            '    nif:beginIndex "%d"^^xsd:nonNegativeInteger ;' % s,
            '    nif:endIndex "%d"^^xsd:nonNegativeInteger ;' % e,
            '    nif:anchorOf "%s" ;' % _ttl_escape(text[s:e]),
            "    nif:referenceContext <%s#char=0,%d> %s" % (
                uri, n, ";" if m.get("entity") else "."
            ),
        ]
        ent = m.get("entity")
        if ent:
            lines.append(
                '    itsrdf:taConfidence "%s"^^xsd:double ;'
                % repr(float(ent.get("score", 0.0)))
            )
            lines.append("    itsrdf:taIdentRef <%s> ." % ent["item_url"])
    return "\n".join(lines) + "\n"


_CTX_RE = re.compile(
    r"<(?P<uri>[^>]*?)#char=0,\d+>(?P<body>.*?nif:isString\s+\"(?P<text>(?:[^\"\\]|\\.)*)\")",
    re.DOTALL,
)
_PHRASE_RE = re.compile(
    r"<[^>]*?#char=(?P<s>\d+),(?P<e>\d+)>\s*\n\s*a nif:Phrase"
    r"(?P<body>.*?)(?=\n\n|\Z)",
    re.DOTALL,
)
_IDENT_RE = re.compile(r"itsrdf:taIdentRef\s+<([^>]*)>")
_CONF_RE = re.compile(r'itsrdf:taConfidence\s+"([^"]*)"')


def read_nif(nif_data: str) -> dict:
    """NIF Turtle → {uri, text, mentions: [{start, end, sf[, entity]}]}
    (reference read_nif, inout/nif.py:30-49). Request documents carry
    bare spans; RESPONSE documents (the GERBIL exchange's other
    direction) carry itsrdf annotations, surfaced as
    ``entity: {item_url, score}`` so the exchange round-trips through
    one parser."""
    ctx = _CTX_RE.search(nif_data)
    if ctx is None:
        raise ValueError("no nif:Context found")
    uri = ctx.group("uri")
    text = _ttl_unescape(ctx.group("text"))
    mentions = []
    for m in _PHRASE_RE.finditer(nif_data):
        s, e = int(m.group("s")), int(m.group("e"))
        mention = {"start": s, "end": e, "sf": text[s:e]}
        ident = _IDENT_RE.search(m.group("body"))
        if ident:
            conf = _CONF_RE.search(m.group("body"))
            mention["entity"] = {
                "item_url": ident.group(1),
                "score": float(conf.group(1)) if conf else 0.0,
            }
        mentions.append(mention)
    mentions.sort(key=lambda d: (d["start"], d["end"]))
    return {"uri": uri, "text": text, "mentions": mentions}
