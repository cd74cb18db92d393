"""Enforcing constraints after every solver step with a post-step hook.

Mirrors `/root/reference/examples/advanced_pdes/post_step_hook.py` — the hook
runs INSIDE the compiled device loop (jax-traceable), clipping the state and
counting the modifications it makes.
"""

import jax.numpy as jnp

import pde_tpu as pde


class ClippedDiffusion(pde.DiffusionPDE):
    """Diffusion whose state is clipped to [0, 1] after each step."""

    def make_post_step_hook(self, state):
        def hook(leaves, t, data):
            clipped = [jnp.clip(y, 0.0, 1.0) for y in leaves]
            changed = sum(
                jnp.sum(y != c) for y, c in zip(leaves, clipped)
            )
            return clipped, data + changed

        return hook, 0.0  # initial hook data: modification counter


grid = pde.UnitGrid([32, 32], periodic=True)
state = pde.ScalarField.random_uniform(grid, -0.5, 1.5)
eq = ClippedDiffusion(diffusivity=0.5)
result, info = eq.solve(state, t_range=1, dt=0.01, tracker=None, ret_info=True)
print("state modifications:", info["solver"]["post_step_data"])
result.plot(title="clipped diffusion")
