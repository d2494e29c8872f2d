"""Chip probe: compile + time pallas_encode_grouped at bench shapes."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from vcf_tpu.entropy import rans
from vcf_tpu.ops.pallas import rans_encode as re_

rng = np.random.default_rng(0)
G, SG = 64, 1024
S = G * SG
L = 768
syms = rng.integers(0, 200, size=(S, L)).astype(np.uint8)
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
sd = jnp.asarray(syms)

t0 = time.time()
wx, nwx, stx, ctx = rans.jax_encode_grouped(sd, fj, cj, unroll=4, with_counts=True)
nwx = int(nwx)
print(f"xla encode ok: nw={nwx} ({time.time()-t0:.1f}s)")

t0 = time.time()
rows, counts, states = re_.pallas_encode_grouped(sd, fj, cj, unroll=4)
wp, nwp = re_.assemble_stream(rows, counts)
nwp = int(nwp)
print(f"pallas encode compile+run {time.time()-t0:.1f}s nw={nwp}")
ok = (nwp == nwx and np.array_equal(np.asarray(wp[:nwp]), np.asarray(wx[:nwx]))
      and np.array_equal(np.asarray(states), np.asarray(stx))
      and np.array_equal(np.asarray(counts), np.asarray(ctx)))
print("bit-exact:", ok)

@jax.jit
def timed(reps):
    def body(i, acc):
        rows, counts, states = re_.pallas_encode_grouped(
            jnp.roll(sd, i, axis=0), fj, cj, unroll=4)
        w, nw = re_.assemble_stream(rows, counts)
        return acc + nw + w[0].astype(jnp.int32)
    return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

int(timed(jnp.int32(1))); int(timed(jnp.int32(1)))
t0 = time.time(); int(timed(jnp.int32(2))); t2 = time.time() - t0
t0 = time.time(); int(timed(jnp.int32(10))); t10 = time.time() - t0
per = (t10 - t2) / 8
print(f"pallas encode+assemble per-rep: {per*1000:.1f} ms  ({S*L/per/1e9:.2f} GB/s)")

# kernel only (no assemble)
@jax.jit
def timed_k(reps):
    def body(i, acc):
        rows, counts, states = re_.pallas_encode_grouped(
            jnp.roll(sd, i, axis=0), fj, cj, unroll=4)
        return acc + counts[0] + rows[0, 0].astype(jnp.int32)
    return jax.lax.fori_loop(0, reps, body, jnp.int32(0))
int(timed_k(jnp.int32(1)))
t0 = time.time(); int(timed_k(jnp.int32(2))); t2 = time.time() - t0
t0 = time.time(); int(timed_k(jnp.int32(10))); t10 = time.time() - t0
perk = (t10 - t2) / 8
print(f"pallas encode kernel per-rep: {perk*1000:.1f} ms")

# XLA encode reference
@jax.jit
def timed_x(reps):
    def body(i, acc):
        w, nw, st = rans.jax_encode_grouped(jnp.roll(sd, i, axis=0), fj, cj, unroll=4)
        return acc + nw + st[0].astype(jnp.int32)
    return jax.lax.fori_loop(0, reps, body, jnp.int32(0))
int(timed_x(jnp.int32(1)))
t0 = time.time(); int(timed_x(jnp.int32(2))); t2 = time.time() - t0
t0 = time.time(); int(timed_x(jnp.int32(10))); t10 = time.time() - t0
perx = (t10 - t2) / 8
print(f"XLA encode per-rep: {perx*1000:.1f} ms  ({S*L/perx/1e9:.2f} GB/s)")

# two-phase raw variant
t0 = time.time()
lows, emits, st2 = re_.pallas_encode_grouped_raw(sd, fj, cj, unroll=4)
wp2, nwp2, cts2 = re_.finish_stream(lows, emits)
nwp2 = int(nwp2)
print(f"raw encode compile+run {time.time()-t0:.1f}s nw={nwp2}")
ok2 = (nwp2 == nwx and np.array_equal(np.asarray(wp2[:nwx]), np.asarray(wx[:nwx]))
       and np.array_equal(np.asarray(st2), np.asarray(stx)))
print("raw bit-exact:", ok2)

@jax.jit
def timed_r(reps):
    def body(i, acc):
        lows, emits, st = re_.pallas_encode_grouped_raw(
            jnp.roll(sd, i, axis=0), fj, cj, unroll=4)
        w, nw, cts = re_.finish_stream(lows, emits)
        return acc + nw + w[0].astype(jnp.int32)
    return jax.lax.fori_loop(0, reps, body, jnp.int32(0))
int(timed_r(jnp.int32(1))); int(timed_r(jnp.int32(1)))
t0 = time.time(); int(timed_r(jnp.int32(2))); t2 = time.time() - t0
t0 = time.time(); int(timed_r(jnp.int32(10))); t10 = time.time() - t0
perr = (t10 - t2) / 8
print(f"raw encode+finish per-rep: {perr*1000:.1f} ms  ({S*L/perr/1e9:.2f} GB/s)")

@jax.jit
def timed_rk(reps):
    def body(i, acc):
        lows, emits, st = re_.pallas_encode_grouped_raw(
            jnp.roll(sd, i, axis=0), fj, cj, unroll=4)
        return acc + lows[0, 0].astype(jnp.int32) + st[0].astype(jnp.int32)
    return jax.lax.fori_loop(0, reps, body, jnp.int32(0))
int(timed_rk(jnp.int32(1)))
t0 = time.time(); int(timed_rk(jnp.int32(2))); t2 = time.time() - t0
t0 = time.time(); int(timed_rk(jnp.int32(10))); t10 = time.time() - t0
print(f"raw kernel only per-rep: {(t10-t2)/8*1000:.1f} ms")
