"""Chip probe: compile + time pallas_decode_grouped at bench shapes.

Queued on the chipserver.  Measures with the in-dispatch fori_loop
timing (docs/PERF_NOTES.md: per-call wall measures the tunnel).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from vcf_tpu.entropy import rans
from vcf_tpu.ops.pallas import rans_decode as rd

rng = np.random.default_rng(0)
G, SG = 64, 1024
S = G * SG
L = 768                      # ~50M symbols
syms = rng.integers(0, 200, size=(S, L)).astype(np.uint8)
# skew per group so tables differ
for g in range(G):
    syms[g*SG:(g+1)*SG] = (syms[g*SG:(g+1)*SG] % (4 + 2*g)).astype(np.uint8)
freqs_g = np.stack([
    rans.quantize_freqs(np.bincount(syms[g*SG:(g+1)*SG].reshape(-1),
                        minlength=256), min_all=True) for g in range(G)])
cums_g = np.stack([
    np.concatenate(([0], np.cumsum(f)))[:256].astype(np.uint32)
    for f in freqs_g])

fj = jnp.asarray(freqs_g.astype(np.uint32))
cj = jnp.asarray(cums_g)
t0 = time.time()
w, nw, st, counts = rans.jax_encode_grouped(
    jnp.asarray(syms), fj, cj, unroll=4, with_counts=True)
nw = int(nw)
counts_h = np.asarray(counts)
print(f"encode ok: nw={nw} max_step_count={counts_h.max()} ({time.time()-t0:.1f}s)")

cap = 1024 * max(1, -(-int(counts_h.max()) // 1024))
cap = max(cap, 4096)
wpad = jnp.concatenate([w[:nw], jnp.zeros(cap + 16, jnp.uint16)])
t0 = time.time()
win = rd.build_windows(wpad, counts, cap)
win.block_until_ready()
print(f"build_windows compile+run {time.time()-t0:.1f}s, shape {win.shape}")

for unroll in (4,):
    t0 = time.time()
    out = rd.pallas_decode_grouped(win, st, fj, cj, L, cap, unroll=unroll)
    outh = np.asarray(out)
    print(f"pallas decode unroll={unroll} compile+run {time.time()-t0:.1f}s")
    ok = np.array_equal(outh, syms)
    print("bit-exact:", ok)

# timing: reps inside one dispatch via lax.fori_loop over the jitted fn
@jax.jit
def timed(reps):
    def body(i, acc):
        o = rd.pallas_decode_grouped(win, st, fj, cj, L, cap, unroll=4)
        return acc + jnp.sum(o[0, :1].astype(jnp.int32)) + i * 0
    return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

for reps in (1, 3):
    t0 = time.time()
    v = int(timed(jnp.int32(reps)))
    print(f"reps={reps}: {time.time()-t0:.3f}s")
t0 = time.time(); int(timed(jnp.int32(2))); t2 = time.time() - t0
t0 = time.time(); int(timed(jnp.int32(34))); t6 = time.time() - t0
per = (t6 - t2) / 32
print(f"pallas decode per-rep: {per*1000:.1f} ms  ({S*L/per/1e9:.2f} GB/s)")

# XLA hier reference timing for the same data
@jax.jit
def timed_x(reps):
    def body(i, acc):
        o = rans.jax_decode_hier(wpad, jnp.int32(0), st, fj, cj, L, unroll=4)
        return acc + jnp.sum(o[:1, 0].astype(jnp.int32)) + i * 0
    return jax.lax.fori_loop(0, reps, body, jnp.int32(0))
int(timed_x(jnp.int32(1)))
t0 = time.time(); int(timed_x(jnp.int32(2))); t2 = time.time() - t0
t0 = time.time(); int(timed_x(jnp.int32(6))); t6 = time.time() - t0
perx = (t6 - t2) / 4

# build_windows runtime (part of the pallas decode cost)
@jax.jit
def timed_w(reps):
    def body(i, acc):
        wn = rd.build_windows(wpad, jnp.roll(counts, i & 1), cap)
        return acc + wn[0, 0] + i * 0
    return jax.lax.fori_loop(0, reps, body, jnp.int32(0))
int(timed_w(jnp.int32(1)))
t0 = time.time(); int(timed_w(jnp.int32(2))); t2 = time.time() - t0
t0 = time.time(); int(timed_w(jnp.int32(18))); t18 = time.time() - t0
perw = (t18 - t2) / 16
print(f"build_windows per-rep: {perw*1000:.2f} ms")
print(f"XLA hier decode per-rep: {perx*1000:.1f} ms  ({S*L/perx/1e9:.2f} GB/s)")
