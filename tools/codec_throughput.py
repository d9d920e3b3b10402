"""Single-core codec throughput baseline (r11 verdict #4, extended to
the r12 JPEG codec): the registered media queries prove correctness on
small oracle-replayable fixtures, so their walls are Spark-overhead
dominated and say nothing about raw codec cost. This measures the
pure-Python/numpy codecs on REALISTIC raster sizes (256x256 RGB) with
no Spark in the loop, so the "substitute Pillow/libjpeg-turbo at
deployment" notes in operators/multimodal.py sit next to a measured
stdlib baseline instead of an assumption.

Two content profiles per codec, because entropy drives both formats:
  * smooth — horizontal gradient (best case: tiny DEFLATE output, few
    JPEG AC coefficients);
  * noise  — seeded uniform bytes (worst case: incompressible DEFLATE,
    dense AC symbol stream).

Reported per (codec, profile): decode wall (median of trials), decoded
raster MB/s, compressed payload MB/s, and the compressed size. Encode
walls are reported for context (encode is fixture-synthesis cost, not
the 100 TB path). Writes tools/codec_throughput_r12.json.

Usage: python tools/codec_throughput.py [side] [trials]  (default 256 5)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def rasters(side: int) -> dict[str, bytes]:
    import numpy as np

    grad = np.zeros((side, side, 3), dtype=np.uint8)
    for x in range(side):
        grad[:, x, :] = int(x * 255 / (side - 1))
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, size=(side, side, 3), dtype=np.uint8)
    return {"smooth": grad.tobytes(), "noise": noise.tobytes()}


def main() -> int:
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from ssg_etl_spark.operators import multimodal as mm

    out: dict = {"side": side, "trials": trials, "codecs": {}}
    raster_bytes = 3 * side * side
    for profile, raster in rasters(side).items():
        for codec, enc, dec in (
            ("png", lambda r: mm.encode_png(side, side, r), mm.decode_png),
            ("jpeg", lambda r: mm.encode_jpeg(side, side, r), mm.decode_jpeg),
        ):
            t0 = time.monotonic()
            payload = enc(raster)
            enc_wall = time.monotonic() - t0
            walls = []
            for _ in range(trials):
                t0 = time.monotonic()
                dec(payload)
                walls.append(time.monotonic() - t0)
            w = statistics.median(walls)
            out["codecs"][f"{codec}_{profile}"] = {
                "compressed_bytes": len(payload),
                "raster_bytes": raster_bytes,
                "encode_wall_s": round(enc_wall, 5),
                "decode_wall_s": round(w, 5),
                "decode_raster_mb_s": round(raster_bytes / w / 1e6, 2),
                "decode_payload_mb_s": round(len(payload) / w / 1e6, 2),
            }
            r = out["codecs"][f"{codec}_{profile}"]
            print(
                f"{codec:4s} {profile:6s}: payload {len(payload):>8d} B, "
                f"decode {w:.3f}s = {r['decode_raster_mb_s']:.2f} MB/s raster"
                f" ({r['decode_payload_mb_s']:.2f} MB/s compressed)"
            )
    # Header-only triage rows (r13): what a pre-decode filter pays per
    # asset, next to the full-decode cost it avoids. JPEG: marker walk +
    # DQT inversion vs the entropy decode above. MP3: the 4-byte frame
    # chain walk over a realistic 3-minute 128 kbps CBR stream (~6.9k
    # frames) — there IS no stdlib decode to compare against; the row
    # documents that triage cost stays trivial even for the format that
    # stays undecoded.
    jpeg_noise = mm.encode_jpeg(side, side, rasters(side)["noise"])
    mp3 = mm.mp3_frame_bytes(9, 0) * (180 * 44100 // 1152)
    # MP4: a realistic-shape container — tiny moov, 16 MB mdat. The box
    # walk JUMPS over mdat by its length prefix, so triage cost is O(moov),
    # independent of media size; the MB/s number documents exactly that.
    mp4 = mm.mp4_container_bytes(1920, 1080, 600 * 180, with_audio=True)
    mp4 = mp4[:-8] + (8 + 16 * 2**20).to_bytes(4, "big") + b"mdat" + bytes(16 * 2**20)
    for name, payload, fn in (
        ("jpeg_header_scan", jpeg_noise, mm.jpeg_header_scan),
        ("mp3_header_scan", mp3, mm.mp3_header_scan),
        ("mp4_header_scan", mp4, mm.mp4_header_scan),
    ):
        walls = []
        for _ in range(max(trials, 20)):
            t0 = time.monotonic()
            meta = fn(payload)
            walls.append(time.monotonic() - t0)
        w = statistics.median(walls)
        out["triage"] = out.get("triage", {})
        out["triage"][name] = {
            "payload_bytes": len(payload),
            "scan_wall_s": round(w, 6),
            "scan_payload_mb_s": round(len(payload) / w / 1e6, 2),
            "meta": {
                k: v for k, v in meta.items() if not isinstance(v, float)
            },
        }
        print(
            f"{name}: payload {len(payload):>8d} B, scan {w * 1e3:.3f} ms"
            f" = {out['triage'][name]['scan_payload_mb_s']:.1f} MB/s"
        )
    jd = out["codecs"]["jpeg_noise"]["decode_wall_s"]
    out["triage"]["jpeg_scan_vs_decode"] = round(
        jd / out["triage"]["jpeg_header_scan"]["scan_wall_s"], 1
    )

    path = os.path.join(REPO, "tools", "codec_throughput_r13.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
