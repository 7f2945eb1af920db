"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas iterators
(mapInPandas).

The JPEG/compressed-audio decode step is STUBBED (no image/audio
libraries in this container): `_fake_decode` produces deterministic
fake features derived from the bytes, clearly marked. Three formats
decode for REAL in pure stdlib — BMP (`decode_bmp`: struct parsing —
magic, header geometry, row padding, channel sums), PCM WAV
(`decode_wav`: the stdlib wave reader — chunk headers, frame counts,
int16 sample sums), and PNG (`decode_png`: zlib inflate, chunk-CRC
validation, all five scanline filter reversals) — each exercised
end-to-end with value-hash oracles by l52/l53/l57. The Spark-side
plumbing is real everywhere — schema handling, mapInPandas batch
iteration, partition-preserving flow. Swapping the stub for a richer
decoder (PIL / torchaudio / pyav) changes only `_fake_decode`,
nothing in the plan shape.

Scale notes: mapInPandas streams Arrow batches — the full binary column
never materializes on the driver; per-batch memory is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch. Binary payloads ride the
shuffle only if a repartition happens after attach — do metadata joins on
ids, not on rows carrying the payload.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("checksum", T.LongType()),
    ]
)


def attach_fake_payload(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Make an opaque binary 'media' column from text bytes — stands in for
    real image/audio payloads so the plumbing is testable here."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """STUB decoder — deterministic fake dimensions/checksum from bytes.

    A real deployment replaces this body with e.g. PIL.Image.open; the
    signature and everything calling it stays identical.
    """
    n = len(payload)
    # whole-payload byte sum: O(n) like any real decode, C-speed over bytes
    checksum = sum(payload)
    return n, 64 + n % 256, 64 + (n * 7) % 256, checksum


def extract_image_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, schema-declared."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # NULL payload (e.g. null source text) decodes as empty bytes
            feats = [_fake_decode(p if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": [f[0] for f in feats],
                    "width": [f[1] for f in feats],
                    "height": [f[2] for f in feats],
                    "checksum": [f[3] for f in feats],
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("out_bytes", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(media: DataFrame, max_bytes: int = 128) -> DataFrame:
    """Binary -> binary resize plumbing (mapInPandas): the STUB 'resize'
    truncates the payload to `max_bytes` (deterministic, so the byte-length
    contract is oracle-checkable); a real deployment decodes, resamples,
    re-encodes inside the same batch loop. Payload stays executor-side in
    Arrow batches end-to-end."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = [
                bytes(p[:max_bytes]) if p is not None else b""
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": pdf["media_type"].values,
                    "out_bytes": [len(o) for o in out],
                    "payload": out,
                }
            )

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("start_offset", T.LongType()),
        T.StructField("frame_bytes", T.LongType()),
    ]
)


def sample_frames(media: DataFrame, frame_size: int = 256) -> DataFrame:
    """Frame sampling plumbing: one output row per `frame_size`-byte chunk
    of the payload (the stand-in for per-frame video decode — a real
    deployment yields decoded frames from pyav here). mapInPandas is the
    right shape for 1->N row expansion with binary inputs: the expansion
    happens inside the Arrow batch, no explode of a materialized array."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, offs, sizes = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                n = len(p) if p is not None else 0
                for i in range(0, max(1, (n + frame_size - 1) // frame_size)):
                    ids.append(doc_id)
                    idxs.append(i)
                    offs.append(i * frame_size)
                    sizes.append(min(frame_size, n - i * frame_size) if n else 0)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "start_offset": offs,
                    "frame_bytes": sizes,
                }
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


def decode_image_real(payload: bytes):  # pragma: no cover - documented stub
    """Placeholder for a real decoder; raises until a library is wired in."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not available in this environment; "
        "replace _fake_decode with a real decoder to enable"
    )


# ---------------------------------------------------------------------------
# REAL decode path: BMP (pure stdlib — no image library needed). The fake
# payloads above stand in for formats whose decoders aren't in this
# container; BMP needs only struct, so this half of the multimodal surface
# runs a genuine encode -> binary -> parse round trip.
# ---------------------------------------------------------------------------
def encode_bmp(doc_id: int, n_chars: int) -> bytes:
    """A real 24bpp bottom-up BMP whose dimensions and pixels are closed
    forms of (doc_id, n_chars) — so a SQL oracle can predict what the
    decoder must read back out of the binary:
      width  = 4 + n_chars % 13, height = 3 + n_chars % 7
      pixel j (row-major, top-down) has B=G=R = (doc_id*31 + j*7) % 256.
    """
    w = 4 + n_chars % 13
    h = 3 + n_chars % 7
    row_size = (w * 3 + 3) // 4 * 4
    pad = b"\x00" * (row_size - w * 3)
    rows = []
    for y in range(h - 1, -1, -1):  # BMP stores rows bottom-up
        row = bytearray()
        for x in range(w):
            j = y * w + x
            v = (doc_id * 31 + j * 7) % 256
            row += bytes((v, v, v))
        rows.append(bytes(row) + pad)
    pixels = b"".join(rows)
    file_size = 54 + len(pixels)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return header + info + pixels


def decode_bmp(payload: bytes) -> tuple[int, int, int, int]:
    """Parse a 24bpp BMP: validate magic, read header geometry, strip row
    padding, reassemble top-down pixel order, sum the blue channel.
    Returns (width, height, n_bytes, pix_sum). This is an actual binary
    decoder (struct.unpack over the payload), not a stub."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    w, h = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    if bpp != 24:
        raise ValueError(f"expected 24bpp, got {bpp}")
    if w <= 0 or h <= 0:  # negative h = top-down BMP, unsupported here
        raise ValueError(f"unsupported BMP geometry {w}x{h}")
    row_size = (w * 3 + 3) // 4 * 4
    # Don't trust the header: a truncated/lying payload would otherwise
    # silently short-slice rows and produce a wrong pix_sum.
    if len(payload) < data_off + row_size * h:
        raise ValueError("truncated BMP: pixel array exceeds payload")
    # Real-world writers often put 0 or a padded value in the header
    # file_size field, so it is ignored — the pixel-array bounds check
    # above is the one protecting pix_sum; n_bytes reports the actual
    # payload length (identical for our fixtures, which write the field
    # correctly).
    pix_sum = 0
    for y in range(h):
        off = data_off + (h - 1 - y) * row_size  # undo bottom-up
        row = payload[off : off + w * 3]
        pix_sum += sum(row[0::3])  # blue channel
    return w, h, len(payload), pix_sum


BMP_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("pix_sum", T.LongType()),
    ]
)


def bmp_roundtrip_features(docs: DataFrame) -> DataFrame:
    """Encode a real BMP per document and decode it back, all inside ONE
    mapInPandas pass (payloads never leave the executor or cross a
    shuffle). The decoded geometry/byte-size/pixel-sum are closed forms
    of (doc_id, n_chars), so the whole binary round trip value-hash
    checks against SQL."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "width": [], "height": [], "n_bytes": [], "pix_sum": []}
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                w, h, nb, ps = decode_bmp(encode_bmp(int(doc_id), int(n_chars)))
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(nb)
                out["pix_sum"].append(ps)
            yield pd.DataFrame(out)

    return docs.select("doc_id", "n_chars").mapInPandas(
        batches, schema=BMP_FEATURE_SCHEMA
    )


# ---------------------------------------------------------------------------
# REAL audio decode path: PCM WAV via the stdlib `wave` module — the audio
# analog of the BMP round trip above.
# ---------------------------------------------------------------------------
def encode_wav(doc_id: int, n_chars: int, framerate: int = 8000) -> bytes:
    """A real mono 16-bit PCM WAV whose length and samples are closed
    forms of (doc_id, n_chars):
      n_samples = 100 + n_chars % 50
      sample j  = ((doc_id*17 + j*11) % 65536) - 32768   (int16)
    Written by the stdlib wave module (RIFF/fmt/data chunks)."""
    n_samples = 100 + n_chars % 50
    frames = b"".join(
        struct.pack("<h", ((doc_id * 17 + j * 11) % 65536) - 32768)
        for j in range(n_samples)
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(frames)
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, int, int, int]:
    """Parse a WAV with the stdlib wave reader: channel/width/rate checks,
    frame count from the header, then unpack the int16 samples and sum
    them. Returns (n_samples, framerate, n_bytes, sample_sum)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError("expected mono 16-bit PCM")
        n = w.getnframes()
        rate = w.getframerate()
        samples = struct.unpack(f"<{n}h", w.readframes(n))
    return n, rate, len(payload), sum(samples)


WAV_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("framerate", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sample_sum", T.LongType()),
    ]
)


def wav_roundtrip_features(docs: DataFrame) -> DataFrame:
    """Encode a real WAV per document and decode it back inside one
    mapInPandas pass (see bmp_roundtrip_features — same contract: the
    payload never crosses a shuffle, and every decoded value is a closed
    form the SQL oracle predicts)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "n_samples": [], "framerate": [],
                "n_bytes": [], "sample_sum": [],
            }
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                n, rate, nb, ssum = decode_wav(
                    encode_wav(int(doc_id), int(n_chars))
                )
                out["doc_id"].append(int(doc_id))
                out["n_samples"].append(n)
                out["framerate"].append(rate)
                out["n_bytes"].append(nb)
                out["sample_sum"].append(ssum)
            yield pd.DataFrame(out)

    return docs.select("doc_id", "n_chars").mapInPandas(
        batches, schema=WAV_FEATURE_SCHEMA
    )


# ---------------------------------------------------------------------------
# REAL compressed-image decode path: PNG in pure stdlib (zlib inflate +
# per-row unfilter + chunk CRC validation). This closes the "compressed
# format" gap the BMP/WAV round trips left: the payload is genuinely
# entropy-coded, so the decoder exercises inflate, scanline filter
# reversal (all five PNG filter types), and CRC32 integrity — everything a
# real PNG reader does short of palette/interlace support.
# ---------------------------------------------------------------------------
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body))
    )


def encode_png(doc_id: int, n_chars: int) -> bytes:
    """A real 8-bit grayscale PNG whose geometry and pixels are closed
    forms of (doc_id, n_chars):
      width  = 4 + n_chars % 13, height = 3 + n_chars % 7
      pixel j (row-major) = (doc_id*13 + j*5) % 256.
    Row y is written with PNG filter type y % 5 — None/Sub/Up/Average/
    Paeth all get exercised (height >= 5 hits every type) — then the
    filtered scanlines are zlib-deflated into one IDAT chunk."""
    w = 4 + n_chars % 13
    h = 3 + n_chars % 7
    pix = [[(doc_id * 13 + (y * w + x) * 5) % 256 for x in range(w)] for y in range(h)]
    raw = bytearray()
    for y in range(h):
        ft = y % 5
        raw.append(ft)
        prior = pix[y - 1] if y else [0] * w
        row = pix[y]
        for x in range(w):
            a = row[x - 1] if x else 0  # left
            b = prior[x]  # up
            c = prior[x - 1] if x else 0  # up-left
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            raw.append((row[x] - pred) % 256)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, int, int, int]:
    """Parse an 8-bit grayscale PNG: signature check, chunk walk with
    CRC32 validation, IHDR geometry, zlib-inflate the concatenated IDAT
    stream, reverse the per-row filter (all five types), and sum the
    reconstructed pixels. Returns (width, height, n_pix, pix_sum,
    raw_len) where raw_len is the decompressed scanline byte count
    h*(1+w) — a closed form, unlike the entropy-coded payload size."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = bytearray()
    while pos < len(payload):
        # 12 = 4-byte length + 4-byte tag + 4-byte CRC: anything shorter
        # would make the unpacks below raise struct.error instead of the
        # ValueError this parser contracts to raise on malformed input
        if pos + 12 > len(payload):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        if pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if crc != zlib.crc32(tag + body):
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or ctype != 0 or comp or filt or ilace:
                raise ValueError("only 8-bit non-interlaced grayscale supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (1 + w):
        raise ValueError("decompressed scanline size mismatch")
    pix_sum = 0
    prior = [0] * w
    for y in range(h):
        ft = raw[y * (1 + w)]
        if ft > 4:
            raise ValueError(f"bad filter type {ft}")
        line = raw[y * (1 + w) + 1 : (y + 1) * (1 + w)]
        row = []
        for x in range(w):
            a = row[x - 1] if x else 0
            b = prior[x]
            c = prior[x - 1] if x else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            row.append((line[x] + pred) % 256)
        pix_sum += sum(row)
        prior = row
    return w, h, w * h, pix_sum, len(raw)


PNG_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_pix", T.LongType()),
        T.StructField("pix_sum", T.LongType()),
        T.StructField("raw_len", T.LongType()),
    ]
)


def png_roundtrip_features(docs: DataFrame) -> DataFrame:
    """Encode a real PNG per document and decode it back inside one
    mapInPandas pass (the bmp/wav round-trip contract: payloads never
    cross a shuffle; every decoded value is a closed form the SQL oracle
    predicts — except the entropy-coded byte size, which is why raw_len
    reports the decompressed scanline count instead)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "width": [], "height": [],
                "n_pix": [], "pix_sum": [], "raw_len": [],
            }
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                w, h, np_, ps, rl = decode_png(
                    encode_png(int(doc_id), int(n_chars))
                )
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_pix"].append(np_)
                out["pix_sum"].append(ps)
                out["raw_len"].append(rl)
            yield pd.DataFrame(out)

    return docs.select("doc_id", "n_chars").mapInPandas(
        batches, schema=PNG_FEATURE_SCHEMA
    )


# Shared by l57 (parquet-columns path) and r78 (binaryFile path): the
# closed forms a decoded encode_png(doc_id, n_chars) payload must yield.
# ONE copy — if the encoder's formulas change, every consumer's oracle
# moves with them.
PNG_ORACLE_SQL = """
    WITH g AS (
      SELECT doc_id,
             4 + n_chars % 13 AS width,
             3 + n_chars % 7 AS height
      FROM documents
    )
    SELECT doc_id,
           CAST(width AS BIGINT) AS width,
           CAST(height AS BIGINT) AS height,
           CAST(width * height AS BIGINT) AS n_pix,
           CAST(list_reduce(list_transform(range(0, width * height),
                  j -> (doc_id * 13 + j * 5) % 256), (a, b) -> a + b)
                AS BIGINT) AS pix_sum,
           CAST(height * (1 + width) AS BIGINT) AS raw_len
    FROM g
    """


def png_payload_features(
    df: DataFrame, payload_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Decode a PNG payload column with decode_png inside one mapInPandas
    pass — the consume half of the round trip, shared by whatever source
    produced the bytes (encode-on-the-fly in l57, binaryFile scan in
    r78). Payloads stay in Arrow batches; nothing crosses a shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {f.name: [] for f in PNG_FEATURE_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, np_, ps, rl = decode_png(bytes(payload))
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_pix"].append(np_)
                out["pix_sum"].append(ps)
                out["raw_len"].append(rl)
            yield pd.DataFrame(out)

    return df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    ).mapInPandas(batches, schema=PNG_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# GIF87a: the multimodal surface's second REAL entropy coding — LZW with
# variable code widths (PNG/l57 covers zlib/DEFLATE; this covers the
# dictionary-coder family). Pure stdlib on both ends.
# ---------------------------------------------------------------------------
_GIF_PALETTE_BITS = 4  # 16-color palette -> min LZW code size 4, so the
# 5->6->7->8-bit code-width transitions are exercised even on tiny images


def _gif_palette() -> list[tuple[int, int, int]]:
    return [(i * 3 % 256, i * 7 % 256, i * 11 % 256) for i in range(16)]


class _BitWriter:
    """LSB-first bit packer (GIF's LZW bit order)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(indices: list[int], mcs: int) -> bytes:
    """GIF-variant LZW: clear/EOI codes, code width grows when the next
    dictionary slot would not fit, table reset at 4096."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    bw = _BitWriter()
    width = mcs + 1
    bw.write(clear, width)
    table: dict[bytes, int] = {bytes([i]): i for i in range(1 << mcs)}
    next_code = eoi + 1
    buf = b""
    for idx in indices:
        nxt = buf + bytes([idx])
        if nxt in table:
            buf = nxt
            continue
        bw.write(table[buf], width)
        table[nxt] = next_code
        next_code += 1
        # The decoder learns this entry only after reading the NEXT code,
        # and bumps its read width when its next_code hits 1<<width — so
        # the encoder bumps one step later than the table size suggests.
        if next_code == (1 << width) + 1:
            if width < 12:
                width += 1
            else:  # table full: reset, like real writers do
                bw.write(clear, 12)
                table = {bytes([i]): i for i in range(1 << mcs)}
                next_code = eoi + 1
                width = mcs + 1
        buf = bytes([idx])
    if buf:
        bw.write(table[buf], width)
    bw.write(eoi, width)
    return bw.flush()


def _lzw_encode_uncompressed(indices: list[int], mcs: int) -> bytes:
    """The classic 'LZW-free GIF writer' trick: emit every pixel as a
    literal code and a clear code often enough that the width never
    grows. Trivially auditable — exists so decode_gif is validated
    against an INDEPENDENT second encoder, not just its own mirror."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    bw = _BitWriter()
    bw.write(clear, width)
    # after a clear the decoder's next_code is eoi+1; it adds one entry
    # per literal after the first, so (1<<width) - eoi - 2 literals are
    # safe before the width would change
    budget = (1 << width) - eoi - 2
    n = 0
    for idx in indices:
        if n >= budget:
            bw.write(clear, width)
            n = 0
        bw.write(idx, width)
        n += 1
    bw.write(eoi, width)
    return bw.flush()


def _gif_container(w: int, h: int, lzw_data: bytes) -> bytes:
    pal = b"".join(bytes(c) for c in _gif_palette())
    # logical screen descriptor: global color table, 4 bits/entry
    lsd = struct.pack("<HHBBB", w, h, 0x80 | ((_GIF_PALETTE_BITS - 1) << 4)
                      | (_GIF_PALETTE_BITS - 1), 0, 0)
    img = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    blocks = bytearray([_GIF_PALETTE_BITS])  # min LZW code size
    for i in range(0, len(lzw_data), 255):
        chunk = lzw_data[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"  # block terminator
    return b"GIF87a" + lsd + pal + img + bytes(blocks) + b"\x3b"


def _gif_indices(doc_id: int, n_pix: int) -> list[int]:
    return [(doc_id * 17 + j * 3) % 16 for j in range(n_pix)]


def encode_gif(doc_id: int, n_chars: int, compressed: bool = True) -> bytes:
    """A real GIF87a whose geometry and palette indices are closed forms
    of (doc_id, n_chars): width = 5 + n_chars % 11, height = 4 +
    n_chars % 6, palette index j = (doc_id*17 + j*3) % 16, palette
    entry i = (3i, 7i, 11i) mod 256. compressed=False writes the same
    image through the independent clear-code literal encoder."""
    w, h = 5 + n_chars % 11, 4 + n_chars % 6
    idx = _gif_indices(doc_id, w * h)
    enc = _lzw_encode if compressed else _lzw_encode_uncompressed
    return _gif_container(w, h, enc(idx, _GIF_PALETTE_BITS))


def decode_gif(payload: bytes) -> tuple[int, int, int, int, int]:
    """Parse a GIF87a/89a: header, logical screen descriptor, global
    color table, image descriptor, sub-block walk, then a full GIF-LZW
    decode (variable code width, clear/EOI handling, the deferred
    next-code entry). Returns (width, height, n_pix, idx_sum, rgb_sum)
    where idx_sum sums palette indices and rgb_sum sums the r+g+b of
    each pixel through the palette."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    if not flags & 0x80:
        raise ValueError("missing global color table")
    gct_n = 2 << (flags & 0x07)
    pal = [tuple(payload[pos + 3 * i : pos + 3 * i + 3]) for i in range(gct_n)]
    pos += 3 * gct_n
    while pos < len(payload) and payload[pos] == 0x21:  # extension blocks
        pos += 2
        while pos < len(payload) and payload[pos]:
            pos += 1 + payload[pos]
        if pos >= len(payload):
            raise ValueError("truncated GIF extension block")
        pos += 1
    if pos >= len(payload) or payload[pos] != 0x2C:
        raise ValueError("missing image descriptor")
    _, _, _, w, h, iflags = struct.unpack_from("<BHHHHB", payload, pos)
    pos += 10
    if iflags & 0xC0:
        raise ValueError("local color tables / interlace unsupported")
    mcs = payload[pos]
    pos += 1
    data = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF sub-block stream")
        blen = payload[pos]
        pos += 1
        if blen == 0:
            break
        if pos + blen > len(payload):
            raise ValueError("truncated GIF sub-block payload")
        data += payload[pos : pos + blen]
        pos += blen
    if pos >= len(payload) or payload[pos] != 0x3B:
        raise ValueError("missing GIF trailer")

    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    acc = nbits = bitpos = 0
    out = bytearray()
    prev: bytes | None = None
    while True:
        while nbits < width:
            if bitpos >= len(data):
                raise ValueError("LZW stream ended without EOI")
            acc |= data[bitpos] << nbits
            bitpos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"bad LZW code {code}")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    if len(out) != w * h:
        raise ValueError("decoded pixel count disagrees with geometry")
    if any(i >= len(pal) for i in out):
        raise ValueError("palette index out of range")
    idx_sum = sum(out)
    rgb_sum = sum(sum(pal[i]) for i in out)
    return w, h, w * h, idx_sum, rgb_sum


GIF_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_pix", T.LongType()),
        T.StructField("idx_sum", T.LongType()),
        T.StructField("rgb_sum", T.LongType()),
    ]
)


def gif_roundtrip_features(docs: DataFrame) -> DataFrame:
    """Encode a real GIF per document and decode it back inside one
    mapInPandas pass (the l52/l53/l57 contract: payloads never cross a
    shuffle or the driver; every decoded value is a closed form of
    (doc_id, n_chars) the SQL oracle predicts). Odd doc_ids go through
    the independent uncompressed writer, so BOTH encoder paths are
    exercised corpus-wide on every run."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {f.name: [] for f in GIF_FEATURE_SCHEMA.fields}
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                payload = encode_gif(
                    int(doc_id), int(n_chars), compressed=doc_id % 2 == 0
                )
                w, h, np_, isum, rsum = decode_gif(payload)
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["n_pix"].append(np_)
                out["idx_sum"].append(isum)
                out["rgb_sum"].append(rsum)
            yield pd.DataFrame(out)

    return docs.select("doc_id", "n_chars").mapInPandas(
        batches, schema=GIF_FEATURE_SCHEMA
    )


# The closed forms a decoded encode_gif(doc_id, n_chars) payload must
# yield — palette entry i = (3i, 7i, 11i) mod 256, index j =
# (doc_id*17 + j*3) % 16.
GIF_ORACLE_SQL = """
    WITH g AS (
      SELECT doc_id,
             5 + n_chars % 11 AS width,
             4 + n_chars % 6 AS height
      FROM documents
    )
    SELECT doc_id,
           CAST(width AS BIGINT) AS width,
           CAST(height AS BIGINT) AS height,
           CAST(width * height AS BIGINT) AS n_pix,
           CAST(list_reduce(list_transform(range(0, width * height),
                  j -> (doc_id * 17 + j * 3) % 16), (a, b) -> a + b)
                AS BIGINT) AS idx_sum,
           CAST(list_reduce(list_transform(range(0, width * height),
                  j -> (((doc_id * 17 + j * 3) % 16) * 3) % 256
                     + (((doc_id * 17 + j * 3) % 16) * 7) % 256
                     + (((doc_id * 17 + j * 3) % 16) * 11) % 256),
                  (a, b) -> a + b) AS BIGINT) AS rgb_sum
    FROM g
    """
