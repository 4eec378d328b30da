"""GGUF checkpoint reader -> tmac-tpu packed params.

The reference pipeline is gguf-centric: llama.cpp consumes gguf INT_N /
i2 / tq1_0 / tq2_0 tensors written by its converter (reference
tools/run_pipeline.py:139-175, step 3, and the `llama-quantize` q4_0 path
at run_pipeline.py:164-175).  Here gguf is an *input* format: existing
llama.cpp-quantized models (Q4_0 / Q8_0 blocks) convert directly into this
framework's packed bit-plane layout, so a llama.cpp user can reuse their
quantized artifacts on TPU without the original HF checkpoint.

Implements a self-contained gguf v2/v3 parser (spec:
github.com/ggerganov/ggml/blob/master/docs/gguf.md):

  Q4_0 block = [fp16 d][16 B nibbles], 32 weights; w = (q - 8) * d
               (nibble j low half = element j, high half = element j+16)
  Q8_0 block = [fp16 d][32 x int8],    32 weights; w = q * d

Q4_0 maps losslessly onto this framework's dequant model
(Wdq = scales * wq - sub) with bits=4, group_size=32, sub = 8 * scales.
Q8_0 tensors (often embeddings) are dequantized to bf16.
"""

from __future__ import annotations

import mmap
import struct
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

GGUF_MAGIC = b"GGUF"

# metadata value types
_T_U8, _T_I8, _T_U16, _T_I16, _T_U32, _T_I32, _T_F32, _T_BOOL, _T_STR, \
    _T_ARR, _T_U64, _T_I64, _T_F64 = range(13)

_SCALAR_FMT = {
    _T_U8: "<B", _T_I8: "<b", _T_U16: "<H", _T_I16: "<h",
    _T_U32: "<I", _T_I32: "<i", _T_F32: "<f", _T_BOOL: "<?",
    _T_U64: "<Q", _T_I64: "<q", _T_F64: "<d",
}

# ggml tensor types (subset)
GGML_F32, GGML_F16, GGML_Q4_0, GGML_Q4_1 = 0, 1, 2, 3
GGML_Q8_0 = 8

_TYPE_NAMES = {GGML_F32: "F32", GGML_F16: "F16", GGML_Q4_0: "Q4_0",
               GGML_Q4_1: "Q4_1", GGML_Q8_0: "Q8_0"}


def _block_layout(ggml_type: int) -> Tuple[int, int]:
    """(elements per block, bytes per block)."""
    if ggml_type == GGML_F32:
        return 1, 4
    if ggml_type == GGML_F16:
        return 1, 2
    if ggml_type == GGML_Q4_0:
        return 32, 18
    if ggml_type == GGML_Q8_0:
        return 32, 34
    raise NotImplementedError(
        f"ggml tensor type {ggml_type} ({_TYPE_NAMES.get(ggml_type, '?')}) "
        "unsupported -- requantize with llama-quantize to Q4_0/Q8_0")


class GGUFReader:
    """Parses header + metadata + tensor directory; tensor data is sliced
    lazily out of an mmap."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        self._off = 0
        magic = self._read_bytes(4)
        assert magic == GGUF_MAGIC, f"not a gguf file: {magic!r}"
        self.version = self._scalar(_T_U32)
        assert self.version in (2, 3), f"gguf version {self.version} unsupported"
        n_tensors = self._scalar(_T_U64)
        n_kv = self._scalar(_T_U64)
        self.metadata: Dict[str, Any] = {}
        for _ in range(n_kv):
            key = self._string()
            self.metadata[key] = self._value(self._scalar(_T_U32))
        self.tensors: Dict[str, dict] = {}
        for _ in range(n_tensors):
            name = self._string()
            nd = self._scalar(_T_U32)
            dims = [self._scalar(_T_U64) for _ in range(nd)]  # ne0 fastest
            ttype = self._scalar(_T_U32)
            offset = self._scalar(_T_U64)
            self.tensors[name] = {"dims": dims, "type": ttype, "offset": offset}
        align = self.metadata.get("general.alignment", 32)
        self._data_start = (self._off + align - 1) // align * align

    # -- low-level readers ---------------------------------------------------
    def _read_bytes(self, n: int) -> bytes:
        b = self._mm[self._off:self._off + n]
        self._off += n
        return b

    def _scalar(self, t: int):
        fmt = _SCALAR_FMT[t]
        n = struct.calcsize(fmt)
        return struct.unpack(fmt, self._read_bytes(n))[0]

    def _string(self) -> str:
        n = self._scalar(_T_U64)
        return self._read_bytes(n).decode("utf-8", errors="replace")

    def _value(self, t: int):
        if t == _T_STR:
            return self._string()
        if t == _T_ARR:
            et = self._scalar(_T_U32)
            n = self._scalar(_T_U64)
            return [self._value(et) for _ in range(n)]
        return self._scalar(t)

    # -- tensor access -------------------------------------------------------
    def tensor_bytes(self, name: str) -> np.ndarray:
        info = self.tensors[name]
        elems = int(np.prod(info["dims"]))
        bele, bbytes = _block_layout(info["type"])
        nbytes = elems // bele * bbytes
        start = self._data_start + info["offset"]
        return np.frombuffer(self._mm, np.uint8, nbytes, start)

    def dequantized(self, name: str) -> np.ndarray:
        """Any supported tensor -> float32, gguf row-major shape
        (dims reversed: (ne1, ne0) = (rows, cols))."""
        info = self.tensors[name]
        dims = info["dims"]
        shape = tuple(reversed(dims))
        t = info["type"]
        raw = self.tensor_bytes(name)
        if t == GGML_F32:
            return raw.view(np.float32).reshape(shape).astype(np.float32)
        if t == GGML_F16:
            return raw.view(np.float16).reshape(shape).astype(np.float32)
        if t == GGML_Q4_0:
            wq, d = self._q4_0_fields(raw)
            return ((wq.astype(np.float32) - 8.0)
                    * d.astype(np.float32)[:, None]).reshape(shape)
        if t == GGML_Q8_0:
            blk = raw.reshape(-1, 34)
            d = blk[:, :2].copy().view(np.float16).reshape(-1)
            q = blk[:, 2:].view(np.int8)
            return (q.astype(np.float32) * d.astype(np.float32)[:, None]).reshape(shape)
        raise NotImplementedError(_TYPE_NAMES.get(t, str(t)))

    @staticmethod
    def _q4_0_fields(raw: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """(per-block uint8 codes (nblocks, 32) in element order, d fp16)."""
        blk = raw.reshape(-1, 18)
        d = blk[:, :2].copy().view(np.float16).reshape(-1)
        qs = blk[:, 2:]
        lo = qs & 0x0F          # elements 0..15
        hi = qs >> 4            # elements 16..31
        return np.concatenate([lo, hi], axis=1), d

    def q4_0_to_quantized(self, name: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Q4_0 matmul weight -> (wq (K, M) uint8, scales (K/32, M) f32,
        sub (K/32, M) f32) in this framework's kernel layout, exactly
        (no dequant round-trip).

        gguf stores weight rows (out-feature m) contiguous over in-feature
        k with quant blocks along k -- transpose to (K, M).
        """
        info = self.tensors[name]
        assert info["type"] == GGML_Q4_0, _TYPE_NAMES.get(info["type"])
        K, M = info["dims"][0], info["dims"][1]  # ne0 = in, ne1 = out
        wq_codes, d = self._q4_0_fields(self.tensor_bytes(name))
        wq = wq_codes.reshape(M, K).T.copy()  # (K, M) uint8 codes 0..15
        scales = d.astype(np.float32).reshape(M, K // 32).T.copy()
        sub = 8.0 * scales
        return wq.astype(np.uint8), scales, sub

    def close(self):
        self._mm.close()
        self._f.close()


# ---------------------------------------------------------------------------
# Model conversion
# ---------------------------------------------------------------------------

def model_config_from_gguf(r: GGUFReader, name: str = "gguf-model"):
    from tmac_tpu.models.config import ModelConfig, QuantConfig
    md = r.metadata
    arch = md.get("general.architecture", "llama")
    def g(key, default=None):
        v = md.get(f"{arch}.{key}", default)
        assert v is not None, f"gguf metadata missing {arch}.{key}"
        return v
    heads = g("attention.head_count")
    emb = g("embedding_length")
    vocab = md.get(f"{arch}.vocab_size")
    if vocab is None:
        vocab = r.tensors["token_embd.weight"]["dims"][1]
    return ModelConfig(
        name=name,
        vocab_size=int(vocab),
        hidden_size=int(emb),
        intermediate_size=int(g("feed_forward_length")),
        num_layers=int(g("block_count")),
        num_heads=int(heads),
        num_kv_heads=int(md.get(f"{arch}.attention.head_count_kv", heads)),
        head_dim=int(md.get(f"{arch}.attention.key_length", emb // heads)),
        rope_theta=float(md.get(f"{arch}.rope.freq_base", 10000.0)),
        rms_norm_eps=float(g("attention.layer_norm_rms_epsilon", 1e-5)),
        tie_word_embeddings="output.weight" not in r.tensors,
        quant=QuantConfig(bits=4, group_size=32, zero_point=True, mode="w_fp"),
    )


def _qt_from_gguf(r: GGUFReader, name: str, tp_m: int, tp_k: int):
    from tmac_tpu.ops.qgemm import QuantizedTensor
    info = r.tensors[name]
    if info["type"] == GGML_Q4_0:
        wq, scales, sub = r.q4_0_to_quantized(name)
        return QuantizedTensor.from_quantized(
            wq, scales, sub, bits=4, group_size=32,
            k_shards=tp_k, m_shards=tp_m, scale_dtype=jnp.bfloat16)
    # fall back: dequantize then requantize at 4 bits (zero_point affine)
    from tmac_tpu.ops.packing import quantize_weights
    w = r.dequantized(name).T  # (K, M)
    wq, scales, sub = quantize_weights(w, 4, 32, True)
    return QuantizedTensor.from_quantized(wq, scales, sub, bits=4,
                                          group_size=32,
                                          k_shards=tp_k, m_shards=tp_m,
                                          scale_dtype=jnp.bfloat16)


def convert_gguf_model(path: str, tp: int = 1, name: str = "gguf-model"):
    """gguf file (Q4_0-quantized llama-family) -> (ModelConfig, params)."""
    from tmac_tpu.ops.qgemm import fuse_m

    r = GGUFReader(path)
    cfg = model_config_from_gguf(r, name=name)

    def bf16(n):
        return jnp.asarray(r.dequantized(n), dtype=jnp.bfloat16)

    layers = []
    for i in range(cfg.num_layers):
        p = f"blk.{i}"
        layers.append({
            "attn_norm": bf16(f"{p}.attn_norm.weight"),
            "mlp_norm": bf16(f"{p}.ffn_norm.weight"),
            "wqkv": fuse_m([
                _qt_from_gguf(r, f"{p}.attn_q.weight", tp, 1),
                _qt_from_gguf(r, f"{p}.attn_k.weight", tp, 1),
                _qt_from_gguf(r, f"{p}.attn_v.weight", tp, 1),
            ]),
            "wo": _qt_from_gguf(r, f"{p}.attn_output.weight", 1, tp),
            "gate_up": fuse_m([
                _qt_from_gguf(r, f"{p}.ffn_gate.weight", tp, 1),
                _qt_from_gguf(r, f"{p}.ffn_up.weight", tp, 1),
            ]),
            "down": _qt_from_gguf(r, f"{p}.ffn_down.weight", 1, tp),
        })

    params: Dict[str, Any] = {
        "embed": bf16("token_embd.weight"),
        "layers": layers,
        "final_norm": bf16("output_norm.weight"),
    }
    if "output.weight" in r.tensors:
        from tmac_tpu.models.llama import make_head
        params["lm_head"] = make_head(r.dequantized("output.weight").T, cfg)
    r.close()
    return cfg, params


# ---------------------------------------------------------------------------
# Minimal writer (tests + interchange)
# ---------------------------------------------------------------------------

def _pack_q4_0(w_mk: np.ndarray) -> bytes:
    """(M, K) float -> Q4_0 blocks (llama.cpp quantize_row_q4_0 semantics:
    d = absmax/-8 signed, q = clip(round(w/d) + 8, 0, 15))."""
    M, K = w_mk.shape
    assert K % 32 == 0
    blocks = w_mk.reshape(M * K // 32, 32).astype(np.float32)
    amax_idx = np.argmax(np.abs(blocks), axis=1)
    maxv = blocks[np.arange(len(blocks)), amax_idx]
    d = maxv / -8.0
    inv = np.where(d == 0, 0.0, 1.0 / np.where(d == 0, 1.0, d))
    q = np.clip(np.trunc(blocks * inv[:, None] + 8.5), 0, 15).astype(np.uint8)
    lo, hi = q[:, :16], q[:, 16:]
    qs = (lo | (hi << 4)).astype(np.uint8)
    out = np.empty((len(blocks), 18), np.uint8)
    out[:, :2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:] = qs
    return out.tobytes()


def write_gguf(path: str, metadata: Dict[str, Any], tensors: Dict[str, tuple]):
    """Write a gguf v3 file. tensors: name -> (ggml_type, np array in
    logical (rows, cols) = (ne1, ne0) layout; float for Q4_0/F32/F16)."""
    def enc_str(s: str) -> bytes:
        b = s.encode()
        return struct.pack("<Q", len(b)) + b

    def enc_val(v) -> bytes:
        if isinstance(v, bool):
            return struct.pack("<I", _T_BOOL) + struct.pack("<?", v)
        if isinstance(v, int):
            return struct.pack("<I", _T_U32) + struct.pack("<I", v)
        if isinstance(v, float):
            return struct.pack("<I", _T_F32) + struct.pack("<f", v)
        if isinstance(v, str):
            return struct.pack("<I", _T_STR) + enc_str(v)
        raise TypeError(type(v))

    align = 32
    blobs, infos, off = [], [], 0
    for tname, (ttype, arr) in tensors.items():
        arr = np.asarray(arr)
        if ttype == GGML_Q4_0:
            data = _pack_q4_0(arr)
        elif ttype == GGML_F32:
            data = arr.astype(np.float32).tobytes()
        elif ttype == GGML_F16:
            data = arr.astype(np.float16).tobytes()
        else:
            raise NotImplementedError(ttype)
        dims = list(reversed(arr.shape))  # ne0 first
        infos.append((tname, dims, ttype, off))
        blobs.append(data)
        off += len(data)
        pad = (-off) % align
        blobs.append(b"\0" * pad)
        off += pad

    hdr = [GGUF_MAGIC, struct.pack("<I", 3),
           struct.pack("<Q", len(tensors)), struct.pack("<Q", len(metadata))]
    for k, v in metadata.items():
        hdr.append(enc_str(k))
        hdr.append(enc_val(v))
    for tname, dims, ttype, toff in infos:
        hdr.append(enc_str(tname))
        hdr.append(struct.pack("<I", len(dims)))
        for d in dims:
            hdr.append(struct.pack("<Q", d))
        hdr.append(struct.pack("<I", ttype))
        hdr.append(struct.pack("<Q", toff))
    header = b"".join(hdr)
    pad = (-len(header)) % align
    with open(path, "wb") as f:
        f.write(header)
        f.write(b"\0" * pad)
        for b in blobs:
            f.write(b)
