"""PII redaction and corpus-wide line dedup (boilerplate removal) —
crafted-case oracles beyond the driver's SQL check."""

import pyarrow as pa
import ray.data as rd

from moonray.functions.dedup import line_dedup
from moonray.functions.text import redact_pii


def _rows(ds):
    return sorted(
        (r for b in ds.iter_batches(batch_format="pyarrow", batch_size=4096)
         for r in b.to_pylist()),
        key=lambda r: r["doc_id"])


def test_redact_pii_kinds_and_counts():
    docs = rd.from_items([
        {"doc_id": 0, "text": "mail a@b.io and c.d+x@e-f.org, "
                              "call +1 555 010 1234 from 192.168.0.1"},
        {"doc_id": 1, "text": "no pii here"},
        {"doc_id": 2, "text": "ip 10.0.0.1 then 8.8.8.8"},
    ])
    out = {r["doc_id"]: r for r in _rows(redact_pii(docs))}
    assert out[0]["text"] == ("mail [EMAIL] and [EMAIL], "
                              "call [PHONE] from [IP]")
    assert (out[0]["n_email"], out[0]["n_phone"], out[0]["n_ipv4"]) == (2, 1, 1)
    assert out[1]["text"] == "no pii here"
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ipv4"]) == (0, 0, 0)
    assert out[2]["text"] == "ip [IP] then [IP]" and out[2]["n_ipv4"] == 2


def test_redact_pii_email_before_ip():
    # an IP-hosted address redacts as ONE email — the host part must not
    # be half-eaten by the later IP rule
    docs = rd.from_items([
        {"doc_id": 0, "text": "mail a@10.0.0.1.net via 10.0.0.1"}])
    (r,) = _rows(redact_pii(docs))
    assert r["n_email"] == 1 and r["n_ipv4"] == 1
    assert r["text"] == "mail [EMAIL] via [IP]"


def test_line_dedup_first_occurrence_wins():
    docs = rd.from_items([
        {"doc_id": 2, "text": "HEADER\nbody two\nFOOTER"},
        {"doc_id": 1, "text": "HEADER\nbody one\nHEADER\nFOOTER"},
        {"doc_id": 3, "text": "HEADER\nFOOTER"},
    ])
    out = {r["doc_id"]: r["text"] for r in _rows(line_dedup(docs))}
    # doc 1 owns HEADER/FOOTER (min doc_id); its in-doc repeat also drops
    assert out[1] == "HEADER\nbody one\nFOOTER"
    assert out[2] == "body two"
    assert 3 not in out  # every line seen earlier elsewhere → doc vanishes


def test_line_dedup_is_deterministic_across_bucketing():
    docs = [{"doc_id": i, "text": f"shared\nuniq {i}\nshared tail {i % 3}"}
            for i in range(30)]
    a = _rows(line_dedup(rd.from_items(docs), num_buckets=2))
    b = _rows(line_dedup(rd.from_items(docs), num_buckets=64))
    assert a == b
    assert a[0]["text"].startswith("shared\n")  # doc 0 keeps the boilerplate
    assert all("shared\n" not in r["text"] and not r["text"].endswith("shared")
               for r in a[1:])
