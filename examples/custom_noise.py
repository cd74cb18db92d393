"""Custom noise structures via `make_noise_realization`.

Mirrors `/root/reference/examples/advanced_pdes/custom_noise.py`: instead of
white noise with a variance, the SDE subclass supplies the full noise
realization — here spatially correlated (colored) noise generated on device.
"""

import numpy as np

import pde_tpu as pde
from pde_tpu.utils.spectral import make_correlated_noise_jax


class CorrelatedNoiseDiffusion(pde.DiffusionPDE):
    """Diffusion driven by spatially correlated rather than white noise."""

    use_noise_variance = False
    use_noise_realization = True

    def make_noise_realization(self, state, backend="jax"):
        noise_fn = make_correlated_noise_jax(
            state.data.shape, correlation="gaussian",
            discretization=state.grid.discretization, length_scale=2.0,
        )
        amplitude = float(np.sqrt(self.noise))

        def realization(leaves, t, key):
            return [amplitude * noise_fn(key) for _ in leaves]

        return realization


grid = pde.UnitGrid([64, 64], periodic=True)
state = pde.ScalarField(grid, data=0.0)
eq = CorrelatedNoiseDiffusion(0.1, noise=0.1, rng=np.random.default_rng(0))
result = eq.solve(state, t_range=1.0, dt=1e-3, tracker=None)
print("fluctuations:", float(result.fluctuations))
result.plot(title="correlated-noise diffusion")
