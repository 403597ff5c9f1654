import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
import mpmath
from sdpb_tpu.mp import limb

K = 48  # slots -> L=47 limbs, ~415 bits
ctx = mpmath.mp.clone(); ctx.prec = 600

rng = np.random.default_rng(0)

def rand_vals(n, emin=-140, emax=140):
    # values with wide exponent range, full mantissa entropy
    out = []
    for _ in range(n):
        m = ctx.mpf(rng.uniform(-1, 1))
        for _ in range(8):
            m += ctx.mpf(rng.uniform(-1, 1)) * ctx.mpf(2) ** int(-53 * rng.integers(1, 8))
        e = int(rng.integers(emin, emax))
        out.append(m * ctx.mpf(2) ** e)
    return out

def to_limb(vals):
    # via f64 words
    from sdpb_tpu.mp import decimal as mpdec
    words = np.stack([mpdec.from_mpf(v, 10) for v in vals])
    return jnp.asarray(limb.from_words_np(words, K))

def check(tag, got_arr, want_vals, tol_bits):
    got = [limb.to_mpf(np.asarray(got_arr[i]), ctx) for i in range(got_arr.shape[0])]
    worst = 0.0
    for g, w in zip(got, want_vals):
        if w == 0:
            err = abs(g)
        else:
            err = abs((g - w) / w)
        worst = max(worst, float(err))
    ok = worst < 2.0 ** (-tol_bits)
    print(f"{tag:24s} worst rel err = {worst:.3e}  (tol 2^-{tol_bits}) {'OK' if ok else 'FAIL'}")
    return ok

vals_a = rand_vals(64)
vals_b = rand_vals(64)
a = to_limb(vals_a); b = to_limb(vals_b)

allok = True
allok &= check("roundtrip", a, vals_a, 400)
allok &= check("add", limb.add(a, b), [x + y for x, y in zip(vals_a, vals_b)], 380)
# near-cancellation
vb2 = [-x * (1 + ctx.mpf(2) ** -200) for x in vals_a]
b2 = to_limb(vb2)
allok &= check("cancel-add", limb.add(a, b2), [x + y for x, y in zip(vals_a, vb2)], 170)
allok &= check("mul", limb.mul(a, b), [x * y for x, y in zip(vals_a, vals_b)], 380)
allok &= check("div", limb.div(a, b), [x / y for x, y in zip(vals_a, vals_b)], 375)
va_pos = [abs(x) for x in vals_a]
ap = limb.abs_(a)
allok &= check("sqrt", limb.sqrt(ap), [ctx.sqrt(x) for x in va_pos], 370)
allok &= check("mul_float", limb.mul_float(a, jnp.asarray(np.float32(3.140625))),
               [x * ctx.mpf("3.140625") for x in vals_a], 380)
allok &= check("add_float", limb.add_float(a, jnp.asarray(np.float32(1.5))),
               [x + ctx.mpf("1.5") for x in vals_a], 300)
allok &= check("mul_pow2", limb.mul_pow2(a, 0.5), [x / 2 for x in vals_a], 400)
allok &= check("scale_pow2_bits", limb.scale_pow2_bits(a, jnp.asarray(-13)),
               [x * ctx.mpf(2) ** -13 for x in vals_a], 400)
allok &= check("neg-raw", -a, [-x for x in vals_a], 400)
allok &= check("where-zero", jnp.where(jnp.zeros(64, bool)[..., None], a, 0.0), [ctx.mpf(0)] * 64, 400)

# comparisons
lt = np.asarray(limb.cmp_lt(a, b))
want_lt = np.array([x < y for x, y in zip(vals_a, vals_b)])
print("cmp_lt ok:", (lt == want_lt).all())
allok &= (lt == want_lt).all()

# fst
fa = np.asarray(limb.fst(a))
wf = np.array([float(x) for x in vals_a], dtype=np.float32)
rel = np.abs((fa - wf) / np.where(wf == 0, 1, wf))
print("fst max rel:", rel.max())
allok &= rel.max() < 1e-4

# lead ordering
key = np.asarray(limb.lead(a))
order_key = np.argsort(key)
order_val = np.argsort([float(x) for x in vals_a])
print("lead order ok:", (order_key == order_val).all())

# NaN propagation
an = a.at[3, 5].set(jnp.nan)
s = limb.add(an, b)
print("nan prop slot0:", bool(~jnp.isfinite(s[3, 0])), bool(jnp.isfinite(s[2, 0])))
allok &= bool(~jnp.isfinite(s[3, 0])) and bool(jnp.isfinite(s[2, 0]))
m_ = limb.mul(an, b)
allok &= bool(~jnp.isfinite(m_[3, 0]))
# div by zero
z = jnp.zeros_like(b)
dv = limb.div(a, z)
print("div0 -> inf limb:", np.asarray(dv[0, 1]), "slot0 finite?", bool(jnp.isfinite(dv[0,0])))
# sqrt of negative -> NaN
sn = limb.sqrt(-ap)
print("sqrt(neg) nan:", bool(jnp.isnan(sn[0, 1])))
allok &= bool(jnp.isnan(sn[0, 1]))

# digitization round trip at small scale: x in [-1,1]
small = [v / ctx.mpf(2) ** (int(ctx.floor(ctx.log(abs(v), 2))) + 1) for v in vals_a]
sa = to_limb(small)
shift = 420
D = (420 + 16) // 8
digs = limb.digits_dev(sa, shift, D)
# reconstruct
rec = []
for i in range(64):
    d = np.asarray(digs[i], dtype=object)
    v = sum(int(d[t]) * (1 << (8 * t)) for t in range(D))
    rec.append(ctx.mpf(int(v)) * ctx.mpf(2) ** (-shift))
worst = max(abs((r - w) / w) for r, w in zip(rec, small))
print("digits_dev worst rel:", float(worst), "OK" if worst < 2.0**-400 else "FAIL")
allok &= worst < 2.0 ** -400

print("ALL OK" if allok else "FAILURES PRESENT")
