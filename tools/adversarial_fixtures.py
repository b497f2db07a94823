#!/usr/bin/env python3
"""Build an ADVERSARIAL fixture dir for cross-engine parity testing.

Copies the sf0.001 tables and injects the edge rows the generator never
emits — null/empty/trailing-space/multi-space text, null lang/source,
duplicate texts, events whose user has no customer row, null event
values, embeddings with a null label / short vector — then the normal
Verify + check_oracle flow turns every LATENT Spark-vs-DuckDB divergence
(null sort order, split semantics, null-key joins) into a visible
mismatch:

    python3 tools/adversarial_fixtures.py /tmp/advfix
    SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /tmp/advfix /tmp/adv_out"
    python3 tools/check_oracle.py /tmp/adv_out /tmp/advfix

Expectation: every oracled query still matches. A mismatch here is a
portability bug of the same class as the ones fixed in the round-7
self-review (NULLS FIRST, split(" ", -1), null-safe joins).

With --float-edges, additionally injects NaN / +-Inf event values and a
NaN embedding element. Expected outcome there is NOT 0 bad: rounded
double paths (similarity, averages) PROPAGATE the poison identically in
both engines (Rounding.roundTo's non-finite guard), while the
integer-unit money/error sums and regression moments fail LOUDLY —
DuckDB cast/range errors or Spark ANSI sum overflow. The contract is
"propagate or error, never silently zero": before the guard, Spark's
LONG-returning floor turned a NaN similarity into 0.0.
"""
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(out, float_edges=False):
    import os
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")

    # ---- documents: the text-pipeline edge rows -------------------------
    docs = pq.read_table(f"{out}/documents.parquet")
    base = docs.to_pylist()
    dup_text = base[0]["text"]  # exact duplicate of an existing doc
    extra = [
        dict(doc_id=90001, text=None, lang="en", source="src0", n_chars=0),
        dict(doc_id=90002, text="", lang="es", source="src1", n_chars=0),
        dict(doc_id=90003, text="trailing space ", lang="de", source="src2",
             n_chars=15),
        dict(doc_id=90004, text="double  space inside", lang=None,
             source="src3", n_chars=20),
        dict(doc_id=90005, text="null source row", lang="fr", source=None,
             n_chars=15),
        dict(doc_id=90006, text=dup_text, lang="en", source="src4",
             n_chars=len(dup_text)),
        dict(doc_id=90007, text=" leading space", lang="en", source="src5",
             n_chars=14),
        # planted PII: the real corpus is digit-free word soup, so these
        # rows are what makes llm_pii_scrub's regex parity (Java regex vs
        # RE2) actually bite in the sweep — email, ipv4, phone, an
        # email-next-to-ip adjacency, and a near-miss (@ with no TLD dot)
        dict(doc_id=90008,
             text="contact bob.smith+x@example-mail.com for details",
             lang="en", source="src0", n_chars=48),
        dict(doc_id=90009, text="server at 10.0.255.7 and 192.168.1.1 up",
             lang="en", source="src1", n_chars=39),
        dict(doc_id=90010, text="call +4915123456789 or +123456789 now",
             lang="de", source="src2", n_chars=37),
        dict(doc_id=90011, text="a@b.co near 1.2.3.4 twice a@b.co end",
             lang="es", source="src3", n_chars=36),
        dict(doc_id=90012, text="not-pii user@localhost and 1.2.3 only",
             lang="en", source="src4", n_chars=37),
        # degenerate-doc co-location: a null-text and an empty-text doc in
        # the SAME (lang, source) block as each other (and as 90001).
        # A gram kernel that gives null/empty text the same sentinel gram
        # would pair them at containment 1.0 while string_split(NULL)
        # drops the null row in DuckDB — these rows make that divergence
        # visible instead of masked by block sparsity.
        dict(doc_id=90013, text="", lang="en", source="src0", n_chars=0),
        # trailing-space doc sharing a real gram with a same-block mate:
        # split(' ') (drops trailing empties) vs string_split (keeps them)
        # changes |grams| and therefore containment's min(|A|,|B|)
        # denominator — exercised only when the pair actually clears the
        # threshold, hence the deliberate overlap.
        dict(doc_id=90014, text="shared tail gram ", lang="de", source="src2",
             n_chars=17),
        dict(doc_id=90015, text="shared tail gram plus more words here",
             lang="de", source="src2", n_chars=37),
        # NEGATIVE id (ADVICE r14): the incremental-ingest keys route
        # seed/deliveries by doc_id residue; Scala % and DuckDB % both
        # return -4 for -90004 % 5 while pmod returns 1 — a plain-% split
        # on one side and a <>-0 bucket on the other silently diverges.
        # Both keys now route on pmod, and this row makes the sweep
        # exercise that leg (it must ride delivery 0 in both engines).
        dict(doc_id=-90004, text="negative id rides exactly one delivery",
             lang="en", source="src1", n_chars=39),
    ]
    merged = pa.Table.from_pylist(base + extra, schema=docs.schema)
    pq.write_table(merged, f"{out}/documents.parquet")

    # ---- events: stream-side edge rows ----------------------------------
    ev = pq.read_table(f"{out}/events.parquet")
    evrows = ev.to_pylist()
    t0 = evrows[0]["ts"]
    extra_ev = [
        # user with NO customer row (left-join null path)
        dict(event_id=90001, ts=t0, user_id=99999, event_type="click",
             value=1.5, props='{"k": 1}'),
        # null value (sum/avg null handling)
        dict(event_id=90002, ts=t0, user_id=1, event_type="view",
             value=None, props='{"k": 2}'),
        # null props (json extraction null path)
        dict(event_id=90003, ts=t0, user_id=2, event_type="error",
             value=2.5, props=None),
    ]
    merged_ev = pa.Table.from_pylist(evrows + extra_ev, schema=ev.schema)
    pq.write_table(merged_ev, f"{out}/events.parquet")

    # ---- embeddings: null label + short vector --------------------------
    emb = pq.read_table(f"{out}/embeddings.parquet")
    erows = emb.to_pylist()
    extra_emb = [
        dict(vec_id=90001, embedding=erows[0]["embedding"], label=None),
        dict(vec_id=90002, embedding=[1.0, -2.0, 3.0], label=0),
        # a positively RESCALED copy of an organic vector (cosine exactly
        # 1, sign fingerprint identical) and an exact duplicate of that
        # copy in the SAME vec_id%5 class — together they exercise the
        # semantic-ingest paths end-to-end through the oracle: within-
        # batch exact dedup (90011 collapses into 90006), delivery-level
        # rescale suppression, and the twin's common-prefix cosine
        dict(vec_id=90006, embedding=[v * 2 for v in erows[1]["embedding"]],
             label=7),
        dict(vec_id=90011, embedding=[v * 2 for v in erows[1]["embedding"]],
             label=8),
    ]
    merged_emb = pa.Table.from_pylist(erows + extra_emb, schema=emb.schema)
    pq.write_table(merged_emb, f"{out}/embeddings.parquet")

    if float_edges:
        ev2 = pq.read_table(f"{out}/events.parquet")
        rows2 = ev2.to_pylist()
        rows2 += [
            dict(event_id=91001, ts=t0, user_id=3, event_type="view",
                 value=float("nan"), props='{"k": 3}'),
            dict(event_id=91002, ts=t0, user_id=4, event_type="view",
                 value=float("inf"), props='{"k": 4}'),
            dict(event_id=91003, ts=t0, user_id=5, event_type="view",
                 value=-float("inf"), props='{"k": 5}'),
        ]
        pq.write_table(pa.Table.from_pylist(rows2, schema=ev2.schema),
                       f"{out}/events.parquet")
        emb2 = pq.read_table(f"{out}/embeddings.parquet")
        er2 = emb2.to_pylist()
        v = list(er2[0]["embedding"])
        v[5] = float("nan")
        er2 += [dict(vec_id=91001, embedding=v, label=1)]
        pq.write_table(pa.Table.from_pylist(er2, schema=emb2.schema),
                       f"{out}/embeddings.parquet")

    print(f"adversarial fixtures written to {out}: "
          f"documents +{len(extra)}, events +{len(extra_ev)}, "
          f"embeddings +{len(extra_emb)}"
          + (", float edges injected" if float_edges else ""))


if __name__ == "__main__":
    main(sys.argv[1], "--float-edges" in sys.argv[2:])
