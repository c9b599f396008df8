import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from bench import build_task, make_batch, make_train_scan, force_done

B, sr, hop = 32, 24000, 160
Tf = sr // hop
task = build_task(sr, compute_dtype=jnp.bfloat16)
state = task.init_state(jax.random.PRNGKey(0))
batch = make_batch(jax.random.PRNGKey(1), B, Tf, hop)
scan = make_train_scan(task.gan_step, 20)
state = scan(state, batch)  # compile + warm
force_done(state.g_params)
jax.profiler.start_trace("/root/repo/.traces/gan20")
state = scan(state, batch)
force_done(state.g_params)
jax.profiler.stop_trace()
print("traced")
