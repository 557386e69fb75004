import sys, time
sys.path.insert(0,'/root/repo')
import jax, jax.numpy as jnp, numpy as np
from bayesianinferencedl_tpu.api import build_pipeline
from bayesianinferencedl_tpu.config import *
from bayesianinferencedl_tpu.infer.pcn import run_pcn, gaussian_misfit
from bayesianinferencedl_tpu.experimental.pcn_fused import run_pcn_fused

cfg = PipelineConfig(mesh=MeshConfig(resolution=4), fem=FEMConfig(cg_tol=1e-7, cg_maxiter=1500),
    rom=ROMConfig(n_snapshots=256, basis_size=40),
    surrogate=SurrogateConfig(hidden=(64,64), n_train=512, epochs=100))
pipe = build_pipeline(cfg)
theta_true = pipe.prior.sample(jax.random.PRNGKey(0))
data = pipe.forward_fn("rom_nn")(theta_true) + 1e-3
theta0 = pipe.prior.sample(jax.random.PRNGKey(2), (1024,))

res = run_pcn_fused(pipe.rom, pipe.P0, pipe.surrogate.params, pipe.surrogate.norm,
                    pipe.prior, data, 1e-3, theta0, jnp.int32(7),
                    n_steps=10_000, n_burn=1000, beta=0.25, cg_iters=20)
res.samples.block_until_ready()
t0=time.time()
res = run_pcn_fused(pipe.rom, pipe.P0, pipe.surrogate.params, pipe.surrogate.norm,
                    pipe.prior, data, 1e-3, theta0, jnp.int32(7),
                    n_steps=10_000, n_burn=1000, beta=0.25, cg_iters=20)
res.samples.block_until_ready()
dt=time.time()-t0
n_kept = res.samples.shape[0]*res.samples.shape[1]
print(f"fused: 10k steps x 1024 chains in {dt:.3f}s -> {n_kept/dt/1e6:.1f}M samples/s, {dt/10000*1e6:.1f} us/step", flush=True)
print("acc", float(res.accept_rate.mean()), flush=True)

# reference XLA sampler, same data
fwd = pipe.forward_fn("rom_nn")
mis = gaussian_misfit(fwd, data, 1e-3)
ref = run_pcn(mis, pipe.prior, theta0, jax.random.PRNGKey(1), n_steps=10_000, n_burn=1000, beta=0.25)
ref.samples.block_until_ready()
t0=time.time()
ref = run_pcn(mis, pipe.prior, theta0, jax.random.PRNGKey(1), n_steps=10_000, n_burn=1000, beta=0.25)
ref.samples.block_until_ready()
dtr = time.time()-t0
print(f"xla:   10k steps in {dtr:.3f}s -> {n_kept/dtr/1e6:.1f}M samples/s", flush=True)
m_f = np.asarray(res.samples).reshape(-1,5).mean(0); m_r = np.asarray(ref.samples).reshape(-1,5).mean(0)
s_f = np.asarray(res.samples).reshape(-1,5).std(0); s_r = np.asarray(ref.samples).reshape(-1,5).std(0)
print("mean fused", m_f.round(4)); print("mean xla  ", m_r.round(4))
print("std  fused", s_f.round(4)); print("std  xla  ", s_r.round(4))
print("acc fused", float(res.accept_rate.mean()), "acc xla", float(ref.accept_rate.mean()))
