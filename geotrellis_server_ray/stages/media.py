"""Multimodal (image/audio/video) stages.

Media payloads are opaque binary/reference columns with typed metadata
(SURVEY.md §1.2); decode / resize / feature-extract run as actor-pool
map_batches stages. The actual codec libraries (PIL, libav, librosa) are NOT
in this container, so the decode kernel is gated: if a codec import succeeds
it is used; otherwise the stage runs a clearly-marked deterministic FAKE
decode (integer arithmetic on the media_ref path ids) so the Ray-side
plumbing — schema, batch shape, actor signature, output layout — is real and
oracle-testable. Call with ``strict=True`` to get the NotImplementedError
instead of the fake.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_REF_RE = r"^mem://media/(?P<d>[0-9]+)/(?P<j>[0-9]+)#"


def _try_import_codecs():
    try:  # pragma: no cover - not present in this container
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


# worker-global synth-JPEG cache: payload bytes are deterministic in
# (w, h, seed), so each distinct image encodes ONCE per worker process
_JPEG_CACHE: dict[tuple[int, int, int], bytes] = {}


def _synth_jpeg(w: int, h: int, seed: int) -> bytes:
    """Deterministic REAL baseline JPEG (the repo's own ITU-T81 encoder,
    functions/jpeg.py): a block-gradient grayscale image where 8x8 block b
    (row-major) is the constant value (seed + 7*b) % 256. Each block is
    DC-only, and the quality-75 luma quantizer step at DC (8) equals the
    orthonormal DCT's DC gain, so decode reproduces every pixel EXACTLY
    (property-tested over all 256 values in tests/test_jpeg.py) — which is
    what makes the decoded pixel stats SQL-expressible."""
    key = (w, h, seed)
    b = _JPEG_CACHE.get(key)
    if b is None:
        from ..functions.jpeg import encode_jpeg

        nbx, nby = w // 8, h // 8
        bidx = np.arange(nby * nbx, dtype=np.int64).reshape(nby, nbx)
        vals = ((seed + 7 * bidx) % 256).astype(np.uint8)
        img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
        b = encode_jpeg(img, quality=75)
        _JPEG_CACHE[key] = b
    return b


def _synth_wav(n: int, rate: int, seed: int) -> bytes:
    """Deterministic REAL RIFF/WAVE PCM16 payload (functions/wav.py): sample
    k = ((seed + 2891*k) mod 65536) - 32768 — pure integer wraparound, so
    the decoded sample sum is exactly SQL-expressible (PCM is lossless)."""
    from ..functions.wav import encode_wav

    k = np.arange(n, dtype=np.int64)
    samples = ((seed + 2891 * k) % 65536 - 32768).astype(np.int16)
    return encode_wav(samples, rate)


def audio_span_payloads(batch: pa.Table) -> pa.Table:
    """AUDIO spans -> real WAV payload bytes (the second-modality twin of
    media_span_payloads; in production this is a storage read). Parameters:
    n = 256 + (d*7 + j*3) % 1024 samples, rate = 8000 * (1 + (d+j) % 3) Hz,
    seed = (d*53 + j*19) % 65536."""
    batch = batch.filter(pc.equal(batch.column("kind"), pa.scalar("audio")))
    m = pc.extract_regex(batch.column("media_ref"), _REF_RE)
    ok = pc.is_valid(m)
    batch = batch.filter(ok)
    m = pc.filter(m, ok)
    d = pc.cast(pc.struct_field(m, "d"), pa.int64()).to_numpy(zero_copy_only=False)
    j = pc.cast(pc.struct_field(m, "j"), pa.int64()).to_numpy(zero_copy_only=False)
    n = 256 + (d * 7 + j * 3) % 1024
    rate = 8000 * (1 + (d + j) % 3)
    seed = (d * 53 + j * 19) % 65536
    payloads = [_synth_wav(int(ni), int(ri), int(si))
                for ni, ri, si in zip(n, rate, seed)]
    return batch.append_column("payload", pa.array(payloads, pa.large_binary()))


def decode_audio_task(batch: pa.Table) -> pa.Table:
    """Real WAV decode: (n_samples, sample_rate, dur_ms, amp_sum) from the
    payload BYTES (per-buffer loop is inherent — RIFF chunk walks are
    sequential per stream, like the JPEG Huffman scan)."""
    from ..functions.wav import decode_wav

    col = batch.column("payload")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    ns = np.empty(n, np.int64)
    rt = np.empty(n, np.int64)
    amp = np.empty(n, np.int64)
    for i in range(n):
        samples, rate = decode_wav(col[i].as_py())
        ns[i] = len(samples)
        rt[i] = rate
        amp[i] = int(samples.astype(np.int64).sum())
    return (batch.append_column("n_samples", pa.array(ns))
            .append_column("sample_rate", pa.array(rt))
            .append_column("dur_ms", pa.array(ns * 1000 // np.maximum(rt, 1)))
            .append_column("amp_sum", pa.array(amp)))


def media_span_payloads(batch: pa.Table) -> pa.Table:
    """Media spans -> REAL JPEG ``payload`` bytes (r3 VERDICT next #3: the
    corpus's media payloads are actual baseline JPEGs encoded by the in-repo
    codec, not arithmetic fakes). Dimensions are 8*(1 + (d*7+j*13)%8) x
    8*(1 + (d*11+j*3)%8) (multiples of 8: no edge padding, decoded shape ==
    encoded shape), content seed (d*37 + j*101) % 256. The per-row loop is
    a cached dict lookup (<= 8*8*256 distinct images per worker); in
    production this stage is replaced by reading payload bytes from
    storage (reference analog: asset byte reads,
    StacAssetRasterSource.scala:29-67)."""
    if "kind" in batch.schema.names:
        # r4: only IMAGE spans carry JPEG payloads (audio spans get real WAV
        # bytes via audio_span_payloads — a JPEG decode of audio would be a
        # category error the r3 fake path silently allowed)
        batch = batch.filter(pc.equal(batch.column("kind"), pa.scalar("image")))
    m = pc.extract_regex(batch.column("media_ref"), _REF_RE)
    ok = pc.is_valid(m)
    batch = batch.filter(ok)
    m = pc.filter(m, ok)
    d = pc.cast(pc.struct_field(m, "d"), pa.int64()).to_numpy(zero_copy_only=False)
    j = pc.cast(pc.struct_field(m, "j"), pa.int64()).to_numpy(zero_copy_only=False)
    w = 8 * (1 + (d * 7 + j * 13) % 8)
    h = 8 * (1 + (d * 11 + j * 3) % 8)
    seed = (d * 37 + j * 101) % 256
    payloads = [_synth_jpeg(int(wi), int(hi), int(si))
                for wi, hi, si in zip(w, h, seed)]
    return (batch.append_column("media_d", pa.array(d, type=pa.int64()))
            .append_column("media_j", pa.array(j, type=pa.int64()))
            .append_column("payload", pa.array(payloads, pa.large_binary())))


class MediaDecode:
    """Actor-pool stage: media spans -> decoded metadata + pixel stats.

    Real path (batch carries a ``payload`` column): decode the bytes with the
    repo's own baseline JPEG decoder (functions/jpeg.py — always available,
    no external codec needed for OUR payload format) -> width/height from the
    decoded array shape, pix_sum = exact int sum of decoded pixels,
    n_frames = 1 (a baseline JPEG is a single frame).

    Fake path (no payload column — video plans and formats this codec can't
    parse): width = 64 + (d*7 + j*13) % 512, height = 64 + (d*11 + j*3) %
    512, n_frames = 1 + (d + j) % 24 — pure integer arithmetic on the ids in
    ``media_ref``, reproducible by the SQL oracle and clearly marked FAKE."""

    def __init__(self, strict: bool = False):
        self.have_codecs = _try_import_codecs()
        self.strict = strict

    def _decode_real(self, batch: pa.Table) -> pa.Table:
        from ..functions.jpeg import decode_jpeg

        col = batch.column("payload")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        width = np.empty(n, np.int64)
        height = np.empty(n, np.int64)
        pix_sum = np.empty(n, np.int64)
        # per-image loop is inherent: a JPEG scan is one sequential Huffman
        # stream (same rationale as the per-buffer crc32 below)
        for i in range(n):
            arr = decode_jpeg(col[i].as_py())
            height[i], width[i] = arr.shape[:2]
            pix_sum[i] = int(arr.sum(dtype=np.int64))
        return (batch.append_column("width", pa.array(width))
                .append_column("height", pa.array(height))
                .append_column("pix_sum", pa.array(pix_sum))
                .append_column("n_frames", pa.array(np.ones(n, np.int64))))

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "payload" in batch.schema.names:
            return self._decode_real(batch)
        if self.strict and not self.have_codecs:
            raise NotImplementedError(
                "media decode requires an image/audio codec library; none in this environment"
            )
        m = pc.extract_regex(batch.column("media_ref"), _REF_RE)
        ok = pc.is_valid(m)
        batch = batch.filter(ok)
        m = pc.filter(m, ok)
        d = pc.cast(pc.struct_field(m, "d"), pa.int64()).to_numpy(zero_copy_only=False)
        j = pc.cast(pc.struct_field(m, "j"), pa.int64()).to_numpy(zero_copy_only=False)
        width = 64 + (d * 7 + j * 13) % 512
        height = 64 + (d * 11 + j * 3) % 512
        n_frames = 1 + (d + j) % 24
        return (
            batch.append_column("media_d", pa.array(d, type=pa.int64()))
            .append_column("media_j", pa.array(j, type=pa.int64()))
            .append_column("width", pa.array(width, type=pa.int64()))
            .append_column("height", pa.array(height, type=pa.int64()))
            .append_column("n_frames", pa.array(n_frames, type=pa.int64()))
        )


class MediaResize:
    """Actor-pool stage: target-size metadata transform (aspect-preserving
    fit into max_side x max_side; integer floor math). The pixel resample
    itself needs a codec (same gating as MediaDecode)."""

    def __init__(self, max_side: int = 256):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch.column("width").to_numpy(zero_copy_only=False)
        h = batch.column("height").to_numpy(zero_copy_only=False)
        m = np.maximum(w, h)
        scale_num = np.minimum(m, self.max_side)
        out_w = np.maximum(1, (w * scale_num) // m)
        out_h = np.maximum(1, (h * scale_num) // m)
        return (
            batch.append_column("out_width", pa.array(out_w, type=pa.int64()))
            .append_column("out_height", pa.array(out_h, type=pa.int64()))
        )


def attach_media_payloads(batch: pa.Table) -> pa.Table:
    """Attach the opaque ``payload`` binary column for media spans — the
    shape real image/audio bytes take (SURVEY.md §1.2: media as opaque binary
    columns with typed metadata). Payload bytes are a deterministic seeded
    pattern sized width*height//64 (so block sizes scale like thumbnails);
    stages carrying this column should run with a SMALL batch_size (the
    memory-aware sizing rule: batch_bytes x concurrency must fit the worker
    heap)."""
    w = batch.column("width").to_numpy(zero_copy_only=False)
    h = batch.column("height").to_numpy(zero_copy_only=False)
    # ids extracted once by MediaDecode (media_d / media_j); fall back to the
    # ref parse only for batches that skipped decode
    if "media_d" in batch.schema.names:
        d = batch.column("media_d").to_numpy(zero_copy_only=False)
        j = batch.column("media_j").to_numpy(zero_copy_only=False)
    else:
        m = pc.extract_regex(batch.column("media_ref"), _REF_RE)
        d = pc.cast(pc.struct_field(m, "d"), pa.int64()).to_numpy(zero_copy_only=False)
        j = pc.cast(pc.struct_field(m, "j"), pa.int64()).to_numpy(zero_copy_only=False)
    sizes = (w * h // 64).astype(np.int64)
    total = int(sizes.sum())
    # one vectorized fill for the whole batch: byte k of span i is
    # (seed_i + k) % 251 — deterministic, content-addressable
    seeds = (d * 131 + j * 17) % 251
    offs = np.zeros(len(sizes) + 1, dtype=np.int64)
    np.cumsum(sizes, out=offs[1:])
    k = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], sizes)
    flat = ((np.repeat(seeds, sizes) + k) % 251).astype(np.uint8)
    # large_binary: int64 offsets — no 2 GiB-per-batch ceiling to trip on
    payload = pa.Array.from_buffers(
        pa.large_binary(),
        len(sizes),
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(flat.tobytes())],
    )
    return batch.append_column("payload", payload)


class MediaFeatureExtract:
    """Actor-pool stage: opaque payload bytes -> a small feature vector
    (16-bin byte histogram, L1-normalized) + length + checksum. The fake
    stand-in for a CNN/audio-embedding forward pass: batched binary in,
    fixed-width float vector out."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib

        col = batch.column("payload")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if not pa.types.is_large_binary(col.type):
            col = pc.cast(col, pa.large_binary())
        n = len(col)
        if n == 0:
            return (
                batch.append_column("n_bytes", pa.array([], pa.int64()))
                .append_column("payload_crc", pa.array([], pa.int64()))
                .append_column("feature", pa.array([], pa.list_(pa.float64(), 16)))
            )
        offs = np.frombuffer(col.buffers()[1], dtype=np.int64)[col.offset : col.offset + n + 1]
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        flat = data[offs[0] : offs[-1]]
        o = offs - offs[0]
        lens = np.diff(o).astype(np.int64)
        # vectorized per-span 16-bin nibble histogram: one bincount over
        # (span_index * 16 + high_nibble) for the whole batch
        seg = np.repeat(np.arange(n, dtype=np.int64), lens)
        idx = seg * 16 + (flat >> 4).astype(np.int64)
        counts = np.bincount(idx, minlength=n * 16).reshape(n, 16).astype(np.float64)
        feats = counts / np.maximum(lens, 1)[:, None]
        # crc32 is inherently per-buffer (zlib C call) — the only per-row op
        crcs = np.fromiter(
            (zlib.crc32(flat[o[i] : o[i + 1]].tobytes()) & 0x7FFFFFFF for i in range(n)),
            dtype=np.int64, count=n,
        )
        return (
            batch.append_column("n_bytes", pa.array(lens))
            .append_column("payload_crc", pa.array(crcs))
            .append_column("feature", pa.array(list(feats), type=pa.list_(pa.float64(), 16)))
        )


# Worker-global decoder for the stateless-task variant (same pattern as
# stages/pip.py / relational.make_broadcast_join): the decoder constructs
# once per long-lived worker process, so repeated executions pay zero
# actor-pool ramp-up. Use this when the pipeline is latency-sensitive;
# map_batches(MediaDecode, concurrency=...) remains the explicit
# actor-pool form (one construction per actor).
_WORKER_DECODER: dict[bool, MediaDecode] = {}


def decode_media_task(batch: pa.Table, strict: bool = False) -> pa.Table:
    dec = _WORKER_DECODER.get(strict)
    if dec is None:
        dec = MediaDecode(strict=strict)
        _WORKER_DECODER[strict] = dec
    return dec(batch)


def frame_sample_batch(batch: pa.Table, every_k: int = 6) -> pa.Table:
    """Frame sampling plan for video spans: one output row per sampled frame
    index (flat_map shape). Deterministic: frames 0, k, 2k, ..."""
    nf = batch.column("n_frames").to_numpy(zero_copy_only=False)
    n_samples = (nf + every_k - 1) // every_k
    reps = pa.array(np.repeat(np.arange(len(batch)), n_samples), type=pa.int64())
    frame_idx = np.concatenate([np.arange(0, n, every_k) for n in nf]) if len(nf) else np.array([], dtype=np.int64)
    out = {name: batch.column(name).take(reps) for name in batch.schema.names}
    out["frame_idx"] = pa.array(frame_idx, type=pa.int64())
    return pa.table(out)


# ------------------------------------------------------------- video (MJPG)

def encode_mjpg(frames: list[bytes]) -> bytes:
    """Tiny motion-JPEG-style container: b"MJPG" + u32 frame count + u32
    offset table (n+1 entries, relative to payload start) + concatenated
    baseline-JPEG frames. The offset table is what makes frame SEEKING real:
    sampling frame k reads exactly one byte range — the shape a remote
    Range-read video source has (rangereader.py)."""
    import struct

    offs = [0]
    for f in frames:
        offs.append(offs[-1] + len(f))
    head = b"MJPG" + struct.pack("<I", len(frames)) \
        + struct.pack(f"<{len(offs)}I", *offs)
    return head + b"".join(frames)


def mjpg_frame_count(data: bytes) -> int:
    import struct

    if data[:4] != b"MJPG":
        raise ValueError("not an MJPG container")
    return struct.unpack("<I", data[4:8])[0]


def mjpg_decode_frame(data: bytes, k: int) -> np.ndarray:
    """Decode ONE frame by seeking its byte range through the offset table."""
    import struct

    from ..functions.jpeg import decode_jpeg

    n = mjpg_frame_count(data)
    if not 0 <= k < n:
        raise IndexError(k)
    table = struct.unpack(f"<{n + 1}I", data[8:8 + 4 * (n + 1)])
    base = 8 + 4 * (n + 1)
    return decode_jpeg(data[base + table[k]:base + table[k + 1]])


def synth_video_payloads(batch: pa.Table) -> pa.Table:
    """Video rows (vid) -> real MJPG payloads: n_frames = 4 + vid % 12,
    frame k = an 8x8 constant-gray JPEG of value (vid * 29 + 11 * k) % 256
    (DC-only -> decodes pixel-exact, the tests/test_jpeg.py invariant)."""
    from ..functions.jpeg import encode_jpeg

    vids = batch.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
    payloads = []
    for v in vids:
        nf = 4 + int(v) % 12
        frames = [encode_jpeg(np.full((8, 8), (int(v) * 29 + 11 * k) % 256,
                                      np.uint8), quality=75)
                  for k in range(nf)]
        payloads.append(encode_mjpg(frames))
    return batch.append_column("payload", pa.array(payloads, pa.large_binary()))


def sample_video_frames(batch: pa.Table, every_k: int = 6) -> pa.Table:
    """REAL frame sampling: read n_frames from the container header, plan
    frames 0, k, 2k, ..., then DECODE each sampled frame through its seeked
    byte range — (vid, n_frames, frame_idx, pix_sum). pix_sum is the exact
    decoded pixel sum (general: holds for any frame content, not just the
    synth fixtures). The per-frame loop is inherent (each frame is one
    sequential Huffman stream)."""
    col = batch.column("payload")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vids = batch.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
    out_v, out_nf, out_fi, out_px = [], [], [], []
    for i in range(len(col)):
        data = col[i].as_py()
        nf = mjpg_frame_count(data)
        for k in range(0, nf, every_k):
            arr = mjpg_decode_frame(data, k)
            out_v.append(int(vids[i]))
            out_nf.append(nf)
            out_fi.append(k)
            out_px.append(int(arr.sum(dtype=np.int64)))
    return pa.table({
        "vid": pa.array(out_v, pa.int64()),
        "n_frames": pa.array(out_nf, pa.int64()),
        "frame_idx": pa.array(out_fi, pa.int64()),
        "pix_sum": pa.array(out_px, pa.int64()),
    })
