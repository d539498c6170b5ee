import sys, time
import numpy as np
import jax, jax.numpy as jnp
from cyberether_tpu.models.wbfm import WbfmReceiver
from cyberether_tpu.ops.firs import fir_filter_streaming, fir_fft_streaming

rx = WbfmReceiver()
n = (1 << 23) // 40 * 40
iq = jax.device_put(rx.make_input(n))

def t(f, *args, steps=10):
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(steps):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/steps*1e3

h = rx._taps; hist = jnp.zeros((2,128), jnp.float32)
xT = jnp.asarray(np.asarray(iq).T.copy())   # pre-transposed on host

f_T = jax.jit(lambda a: a.T + 0.0)
print("transpose (n,2)->(2,n):", f"{t(f_T, iq):.2f} ms")

f_fir = jax.jit(lambda x: fir_filter_streaming(x, h, hist)[0])
print("FIR conv on (2,n):", f"{t(f_fir, xT):.2f} ms")

f_fft = jax.jit(lambda x: fir_fft_streaming(x, h, hist)[0])
print("FIR fft on (2,n):", f"{t(f_fft, xT):.2f} ms")

def disc(x):
    yr, yi = x[0], x[1]
    pr = jnp.concatenate([jnp.zeros((1,), jnp.float32), yr[:-1]])
    pi = jnp.concatenate([jnp.zeros((1,), jnp.float32), yi[:-1]])
    return jnp.arctan2(pr*yi - pi*yr, pr*yr + pi*yi)
print("discriminator:", f"{t(jax.jit(disc), xT):.2f} ms")

def decim(d):
    return d.reshape(n//40, 40).mean(-1)
d0 = xT[0]
print("decimate mean:", f"{t(jax.jit(decim), d0):.2f} ms")

step = rx.jitted_step()
st = rx.init_state()
a, st2 = step(st, iq); jax.block_until_ready(a)
t0=time.perf_counter()
st=rx.init_state()
for _ in range(10): a, st = step(st, iq)
jax.block_until_ready(a)
print("full step:", f"{(time.perf_counter()-t0)/10*1e3:.2f} ms")
