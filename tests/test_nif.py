"""NIF adapter round-trip (reference O2/O4, inout/nif.py)."""

from type_filtered_entity_linker_spark.sources.nif import (
    generate_nif,
    read_nif,
)


def test_nif_round_trip_with_entities():
    doc = {
        "uri": "http://example.org/doc/1",
        "text": 'Alpha "Beta" met\nGamma Corp today.',
        "mentions": [
            {
                "start": 0,
                "end": 5,
                "entity": {
                    "item_url": "http://www.wikidata.org/entity/Q1",
                    "score": 0.875,
                },
            },
            {"start": 17, "end": 27, "entity": None},
        ],
    }
    ttl = generate_nif(doc)
    assert "nif:Context" in ttl and "itsrdf:taIdentRef" in ttl
    back = read_nif(ttl)
    assert back["uri"] == doc["uri"]
    assert back["text"] == doc["text"]
    assert [(m["start"], m["end"]) for m in back["mentions"]] == [
        (0, 5),
        (17, 27),
    ]
    assert back["mentions"][0]["sf"] == "Alpha"
    assert back["mentions"][1]["sf"] == "Gamma Corp"


def test_nif_d2kb_request_shape():
    """A GERBIL D2KB request (context + unannotated phrases) parses into
    the premarked-mentions shape the pipeline consumes."""
    doc = {
        "uri": "http://example.org/doc/2",
        "text": "Prokhorov owns the Nets.",
        "mentions": [
            {"start": 0, "end": 9, "entity": None},
            {"start": 19, "end": 23, "entity": None},
        ],
    }
    back = read_nif(generate_nif(doc))
    spans = [(m["start"], m["end"], m["sf"]) for m in back["mentions"]]
    assert spans == [(0, 9, "Prokhorov"), (19, 23, "Nets")]
