"""One-decode-pass evidence for the combined features+quarantine flow
(VERDICT r12 directive 2).

Two flows over the same 20k-image corpus (1% corrupt), each producing
the identical pair of outputs (feature rows + quarantine rows):

  A (r12, two decodes): image_features(on_error="skip") for features,
    media_decode_errors() for the quarantine list — every payload is
    decoded twice.
  B (r13, one decode):  image_features(on_error="quarantine") persisted
    once, split into (good, bad) by the nullable decode_error column —
    every payload is decoded once.

Interleaved A/B/A/B runs, min-of-2 per flow reported (host noise floor
is ±10-40%, SCALE.md bench protocol). Run: python scripts/quarantine_onepass_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from core_etl_spark.operators import multimodal as M
from core_etl_spark.session import get_spark


def _png_media(spark, n: int):
    """n real PNG payloads (color type 2, filter-0 rows — zlib does real
    work on decode, so this leg is decode-DOMINATED like a production
    corpus; the fake-codec leg's decode is a near-free frombuffer)."""

    def encode(batches):
        import hashlib
        import struct
        import zlib

        import pandas as pd

        def chunk(typ: bytes, data: bytes) -> bytes:
            raw = typ + data
            return (
                struct.pack(">I", len(data)) + raw
                + struct.pack(">I", zlib.crc32(raw))
            )

        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                w, h = 24 + mid % 8, 24 + mid % 5
                body = bytearray()
                seed, i = f"png{mid}", 0
                while len(body) < h * (3 * w + 1):
                    body += hashlib.md5(f"{seed}:{i}".encode()).digest()
                    i += 1
                # zero out each row's filter byte (filter type 0)
                for y in range(h):
                    body[y * (3 * w + 1)] = 0
                payload = (
                    b"\x89PNG\r\n\x1a\n"
                    + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
                    + chunk(b"IDAT", zlib.compress(bytes(body[: h * (3 * w + 1)])))
                    + chunk(b"IEND", b"")
                )
                rows.append({"media_id": mid, "kind": "image",
                             "payload": payload})
            yield pd.DataFrame(rows)

    return spark.range(0, n).mapInPandas(
        encode, schema="media_id long, kind string, payload binary"
    )


def _run_pair(media, codec: str, label: str) -> None:
    def flow_a():
        feats = M.image_features(media, codec=codec, on_error="skip").count()
        errs = (
            M.media_decode_errors(media, codec=codec)
            .filter(F.col("kind") == "image")
            .count()
        )
        return feats, errs

    def flow_b():
        combined = M.image_features(
            media, codec=codec, on_error="quarantine"
        ).persist()
        try:
            good, bad = M.quarantine_split(combined)
            return good.count(), bad.count()
        finally:
            combined.unpersist()

    results = {"A_two_decodes": [], "B_one_decode": []}
    counts = set()
    for _ in range(2):
        for name, flow in (("A_two_decodes", flow_a), ("B_one_decode", flow_b)):
            t0 = time.perf_counter()
            counts.add(flow())
            results[name].append(round(time.perf_counter() - t0, 3))
    assert len(counts) == 1, f"flows disagree: {counts}"
    feats, errs = counts.pop()
    print(f"[{label}] features={feats} quarantined={errs}")
    for name, ts in results.items():
        print(f"[{label}] {name}: runs={ts} min={min(ts)}")
    print(f"[{label}] one-pass speedup (min/min): "
          f"{min(results['A_two_decodes']) / min(results['B_one_decode']):.2f}x")


def main() -> None:
    spark = get_spark(app_name="quarantine_onepass_bench")
    n = 20_000
    corrupt = F.when(
        F.col("media_id") % 300 == 0, F.expr("substring(payload, 1, 3)")
    ).otherwise(F.col("payload"))

    fake = (
        M.synthetic_media(spark, n_per_kind=n)
        .filter(F.col("kind") == "image")
        .withColumn("payload", corrupt)
        .localCheckpoint()  # fixture encode paid once, outside the timings
    )
    _run_pair(fake, "fake", f"fake-codec n={n}")

    # corruption keeps the 8-byte PNG signature: a signature-less blob is
    # indistinguishable from an unsupported format, which is the
    # NON-skippable NotImplementedError class by design
    png_corrupt = F.when(
        F.col("media_id") % 300 == 0, F.expr("substring(payload, 1, 12)")
    ).otherwise(F.col("payload"))
    png = _png_media(spark, n).withColumn(
        "payload", png_corrupt
    ).localCheckpoint()
    _run_pair(png, "real", f"real-PNG n={n}")


if __name__ == "__main__":
    main()
