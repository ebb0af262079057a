import numpy as np, jax, jax.numpy as jnp
import xrslam_tpu.ransac.stereo as st

rng = np.random.default_rng(0)
# synthetic two-view: random 3D points, small motion, normalized coords
N = 256
X = rng.uniform(-2, 2, (N, 3)) + np.array([0, 0, 5.0])
R = np.eye(3)
t = np.array([0.15, 0.02, 0.01])
x1 = X[:, :2] / X[:, 2:3]
Xc2 = (X - t) @ R
x2 = Xc2[:, :2] / Xc2[:, 2:3]
x2 += rng.normal(0, 0.5/400, x2.shape)  # 0.5px noise at f=400
h1 = np.concatenate([x1, np.ones((N,1))], 1)
h2 = np.concatenate([x2, np.ones((N,1))], 1)
valid = np.ones(N, bool)
key = jax.random.PRNGKey(7)
thr = 1.0/400.0  # ~1px at f=400... actually threshold arg is in normalized units scaled below
# call as the tracker does: threshold=1.0 on K-normalized? tracker uses threshold=1.0 with h in normalized coords??
for thr_ in (1.0, 1.0/400):
    _, m, c = st.find_essential_matrix(key, jnp.asarray(h1), jnp.asarray(h2), valid=jnp.asarray(valid), threshold=thr_)
    with jax.disable_jit():
        _, m2, c2 = st.find_essential_matrix(key, jnp.asarray(h1), jnp.asarray(h2), valid=jnp.asarray(valid), threshold=thr_)
    print("thr", thr_, "jit count", int(c), "eager count", int(c2), "mask equal:", bool(jnp.all(m == m2)))
