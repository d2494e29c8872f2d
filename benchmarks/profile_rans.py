"""Component-level profiling of the device rANS codec on the real chip.

CAVEAT (round-2 finding, docs/PERF_NOTES.md): every dispatch through
the axon tunnel costs ~25 ms wall, and `timeit` here times one dispatch
per rep — so every number below includes that constant.  Attribute
costs by DIFFERENCING rows (e.g. dec_full - dec_bare), or use bench.py's
in-dispatch fori_loop method for absolute throughput.

Times each piece of the encode/decode pipeline in isolation (with
ablated variants to attribute scan cost): the transform, the table
lookup, the encode scan, the global compaction, the decode scan, and
the decode scan with (a) the butterfly removed and (b) the symbol-
resolve matmul removed.  Writes benchmarks/profile_rans.json.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, reps=3, warmup=3):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    from vcf_tpu.entropy import rans as R

    n_frames = int(os.environ.get("BENCH_FRAMES", 8))
    h = int(os.environ.get("BENCH_H", 1088))
    w = int(os.environ.get("BENCH_W", 1920))
    from vcf_tpu.io.images import test_image
    from vcf_tpu.config import CodecConfig
    from bench import build_transform_fns

    base = test_image(h, w, seed=3).astype(np.uint8)
    frames = np.stack([np.roll(base, (7 * i, 13 * i), (0, 1))
                       for i in range(n_frames)])
    cfg = CodecConfig(entropy="rans")
    enc_t, dec_t = build_transform_fns(cfg, h, w)
    n_syms = frames.size
    s_streams = R.RANSCodec._pick_streams(n_syms, 65536)
    l_steps = n_syms // s_streams

    k0 = np.asarray(jax.jit(enc_t)(jnp.asarray(frames[:1])))
    freqs = R.quantize_freqs(np.bincount(k0.reshape(-1), minlength=256),
                             min_all=True)
    cums = np.concatenate(([0], np.cumsum(freqs)))[:256].astype(np.uint32)
    f_j = jnp.asarray(freqs.astype(np.uint32))
    c_j = jnp.asarray(cums)
    frames_dev = jax.device_put(frames)

    part = os.environ.get("PROFILE_PART", "all")
    res = {"n_syms": n_syms, "s_streams": int(s_streams), "l": int(l_steps),
           "part": part}

    # ---- encode pieces ----------------------------------------------------
    @jax.jit
    def transform_only(fd):
        return enc_t(fd).reshape(l_steps, s_streams).T

    syms_dev = transform_only(frames_dev)
    syms_dev.block_until_ready()

    def readback(x):
        return int(jnp.sum(x.reshape(-1)[:1].astype(jnp.int32)))

    if part in ("all", "enc"):
        res["enc_transform_s"] = timeit(
            lambda: readback(transform_only(frames_dev)))
        print("enc_transform_s", res["enc_transform_s"], flush=True)

    from vcf_tpu.entropy.interleaved import lookup_tables256

    @jax.jit
    def lookup_only(syms):
        tabs = jnp.stack([f_j.astype(jnp.int32), c_j.astype(jnp.int32)], 1)
        return lookup_tables256(syms, tabs)

    if part in ("all", "enc"):
        res["enc_lookup_s"] = timeit(lambda: readback(lookup_only(syms_dev)))
        print("enc_lookup_s", res["enc_lookup_s"], flush=True)

    @jax.jit
    def enc_scan_only(syms):
        tabs = jnp.stack([f_j.astype(jnp.int32), c_j.astype(jnp.int32)], 1)
        fc = lookup_tables256(syms, tabs)
        f_arr = fc[..., 0].astype(jnp.uint32)
        c_arr = fc[..., 1].astype(jnp.uint32)

        def step(x, inp):
            f, cum = inp
            emit = (x >> jnp.uint32(32 - R.K_PROB)) >= f
            low16 = (x & jnp.uint32(0xFFFF)).astype(jnp.uint16)
            x = jnp.where(emit, x >> 16, x)
            x = ((x // f) << R.K_PROB) + (x % f) + cum
            return x, (low16, emit)

        x0 = jnp.full((s_streams,), R.RANS_L, jnp.uint32)
        x, (lows, emits) = jax.lax.scan(step, x0,
                                        (f_arr.T[::-1], c_arr.T[::-1]))
        return x, lows, emits

    if part == "enc":
        res["enc_lookup_plus_scan_s"] = timeit(
            lambda: readback(enc_scan_only(syms_dev)[0]))
        print("enc_lookup_plus_scan_s", res["enc_lookup_plus_scan_s"],
              flush=True)

    @jax.jit
    def enc_full(syms):
        return R.jax_encode(syms, f_j, c_j)

    if part in ("all", "enc"):
        res["enc_full_s"] = timeit(lambda: readback(enc_full(syms_dev)[2]))
        print("enc_full_s", res["enc_full_s"], flush=True)

    words, n_words, states = enc_full(syms_dev)
    nw = int(n_words)
    res["bpp_payload"] = 16.0 * nw / n_syms
    wpad = jnp.concatenate([words[:nw],
                            jnp.zeros((s_streams + 16,), jnp.uint16)])
    wpad = jax.block_until_ready(wpad)

    # ---- decode pieces ----------------------------------------------------
    @jax.jit
    def dec_full(wp, st):
        return R.jax_decode(wp, jnp.int32(0), st, f_j, c_j, l_steps)

    if part in ("all", "dec"):
        res["dec_full_s"] = timeit(lambda: readback(dec_full(wpad, states)))
        print("dec_full_s", res["dec_full_s"], flush=True)

    # ablation A: no butterfly (wrong output, perf attribution only)
    @functools.partial(jax.jit, static_argnames=())
    def dec_no_butterfly(wp, st):
        c_f = c_j.astype(jnp.float32)
        tab = jnp.stack([jnp.arange(256, dtype=jnp.float32),
                         f_j.astype(jnp.float32), c_f], axis=1)
        d_tab = tab - jnp.concatenate(
            [jnp.zeros((1, 3), jnp.float32), tab[:-1]])

        def step(carry, _):
            x, ptr = carry
            slot = x & jnp.uint32(R.MASK)
            ge = slot.astype(jnp.float32)[:, None] >= c_f[None, :]
            fetched = jnp.dot(ge.astype(jnp.float32), d_tab,
                              precision=jax.lax.Precision.HIGHEST)
            sym = fetched[:, 0].astype(jnp.uint32)
            f = fetched[:, 1].astype(jnp.uint32)
            cum = fetched[:, 2].astype(jnp.uint32)
            x = f * (x >> R.K_PROB) + slot - cum
            renorm = x < jnp.uint32(R.RANS_L)
            chunk = jax.lax.dynamic_slice(wp, (ptr,), (s_streams,))
            x = jnp.where(renorm, (x << 16) | chunk.astype(jnp.uint32), x)
            ptr = ptr + jnp.sum(renorm.astype(jnp.int32))
            return (x, ptr), sym.astype(jnp.uint8)

        (x, ptr), out = jax.lax.scan(
            step, (st.astype(jnp.uint32), jnp.int32(0)), None, length=l_steps)
        return out

    if part in ("all", "dec"):
        res["dec_no_butterfly_s"] = timeit(
            lambda: readback(dec_no_butterfly(wpad, states)))
        print("dec_no_butterfly_s", res["dec_no_butterfly_s"], flush=True)

    # ablation B: no symbol matmul (fixed f/cum; wrong output)
    @jax.jit
    def dec_no_matmul(wp, st):
        def step(carry, _):
            x, ptr = carry
            slot = x & jnp.uint32(R.MASK)
            f = jnp.full((s_streams,), 16, jnp.uint32)
            cum = slot & jnp.uint32(~15)
            x = f * (x >> R.K_PROB) + slot - cum
            renorm = x < jnp.uint32(R.RANS_L)
            chunk = jax.lax.dynamic_slice(wp, (ptr,), (s_streams,))
            routed = R.butterfly_expand(chunk.astype(jnp.uint32), renorm)
            x = jnp.where(renorm, (x << 16) | routed, x)
            ptr = ptr + jnp.sum(renorm.astype(jnp.int32))
            return (x, ptr), (slot & 255).astype(jnp.uint8)

        (x, ptr), out = jax.lax.scan(
            step, (st.astype(jnp.uint32), jnp.int32(0)), None, length=l_steps)
        return out

    if part in ("all", "dec2"):
        res["dec_no_matmul_s"] = timeit(
            lambda: readback(dec_no_matmul(wpad, states)))
        print("dec_no_matmul_s", res["dec_no_matmul_s"], flush=True)

    # ablation C: scan body with NEITHER (pure state arithmetic)
    @jax.jit
    def dec_bare(wp, st):
        def step(carry, _):
            x, ptr = carry
            slot = x & jnp.uint32(R.MASK)
            x = jnp.uint32(16) * (x >> R.K_PROB) + slot
            renorm = x < jnp.uint32(R.RANS_L)
            chunk = jax.lax.dynamic_slice(wp, (ptr, ), (s_streams,))
            x = jnp.where(renorm, (x << 16) | chunk.astype(jnp.uint32), x)
            ptr = ptr + jnp.sum(renorm.astype(jnp.int32))
            return (x, ptr), (slot & 255).astype(jnp.uint8)

        (x, ptr), out = jax.lax.scan(
            step, (st.astype(jnp.uint32), jnp.int32(0)), None, length=l_steps)
        return out

    if part in ("all", "dec2"):
        res["dec_bare_s"] = timeit(lambda: readback(dec_bare(wpad, states)))
        print("dec_bare_s", res["dec_bare_s"], flush=True)

    for k, v in list(res.items()):
        if isinstance(v, float):
            res[k] = round(v, 4)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"profile_rans_{part}.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
