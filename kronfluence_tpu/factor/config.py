"""Hessian-approximation strategies: identity / diagonal / kfac / ekfac.

Faithful re-derivation of the reference strategy registry
(kronfluence/factor/config.py:21-353):

  * a per-strategy boolean requirements matrix drives which artifacts each
    pipeline stage needs;
  * `prepare` performs the one-time damping + reciprocal on device (float64
    under x64 for parity with reference LAMBDA_DTYPE, config.py:199-208,
    253-271,322-339; float32 on accelerators), producing an inverse-lambda
    matrix in the precondition dtype;
  * `precondition` applies the damped iHVP `Q_g ((Q_g^T G Q_a) ∘ Λ^-1) Q_a^T`
    on device (config.py:273-285,341-353) — two MXU matmul sandwiches plus an
    elementwise multiply, which XLA fuses.
"""

from dataclasses import dataclass
from typing import Dict, Optional, Type

import jax
import jax.numpy as jnp
import numpy as np

from kronfluence_tpu.utils.constants import (
    ACTIVATION_EIGENVALUES_NAME,
    ACTIVATION_EIGENVECTORS_NAME,
    GRADIENT_EIGENVALUES_NAME,
    GRADIENT_EIGENVECTORS_NAME,
    HEURISTIC_DAMPING_SCALE,
    LAMBDA_MATRIX_NAME,
    NUM_LAMBDA_PROCESSED,
)
from kronfluence_tpu.utils.dtypes import resolve_dtype

_STRATEGIES: Dict[str, Type["FactorConfig"]] = {}


@dataclass
class PreconditionState:
    """Per-module device-ready preconditioning state.

    Registered as a JAX pytree so it can be passed as an explicit jit
    argument — closing over it would inline hundreds of MB of eigenvectors
    as HLO constants (recompiled per call, and oversized for remote-compile
    services)."""

    inverse_lambda: Optional[jax.Array] = None  # (out_dim, in_dim[+1])
    activation_eigenvectors: Optional[jax.Array] = None  # (in_dim[+1], in_dim[+1])
    gradient_eigenvectors: Optional[jax.Array] = None  # (out_dim, out_dim)


def _precondition_state_flatten(state: "PreconditionState"):
    children = (
        state.inverse_lambda,
        state.activation_eigenvectors,
        state.gradient_eigenvectors,
    )
    return children, None


def _precondition_state_unflatten(aux, children) -> "PreconditionState":
    del aux
    return PreconditionState(*children)


jax.tree_util.register_pytree_node(
    PreconditionState, _precondition_state_flatten, _precondition_state_unflatten
)


class FactorConfig:
    """Base strategy; subclasses self-register by name."""

    strategy: str = ""

    # Requirements matrix (reference: config.py:128-320).
    requires_covariance_matrices: bool = False
    requires_eigendecomposition: bool = False
    requires_eigendecomposition_for_lambda: bool = False
    requires_lambda_matrices: bool = False
    requires_covariance_matrices_for_precondition: bool = False
    requires_eigendecomposition_for_precondition: bool = False
    requires_lambda_matrices_for_precondition: bool = False

    #: Factor-dict keys `prepare()` reads; validated up front so a missing
    #: (e.g. cleared) factors dict fails with a clear error, not a KeyError.
    required_precondition_factors: tuple = ()

    def __init_subclass__(cls, strategy: Optional[str] = None, **kwargs) -> None:
        super().__init_subclass__(**kwargs)
        if strategy is not None:
            cls.strategy = strategy
            _STRATEGIES[strategy] = cls

    @classmethod
    def configs(cls) -> Dict[str, Type["FactorConfig"]]:
        return dict(_STRATEGIES)

    def prepare(
        self,
        factors: Dict[str, np.ndarray],
        damping_factor: Optional[float],
        precondition_dtype,
    ) -> PreconditionState:
        """Host-side one-time preparation of per-module precondition state."""
        raise NotImplementedError

    def precondition(self, gradient: jax.Array, state: PreconditionState) -> jax.Array:
        """Device-side preconditioning of (batch, out_dim, in_dim[+1]) gradients."""
        raise NotImplementedError

    @staticmethod
    def _damp_and_invert(lambda_matrix, damping_factor: Optional[float]) -> jax.Array:
        """Damped reciprocal, on device. Runs in float64 when x64 is enabled
        (parity tests on CPU, matching reference LAMBDA_DTYPE) and float32 on
        accelerators (which have no fp64 path)."""
        wide = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        lam = jnp.asarray(lambda_matrix).astype(wide)
        if damping_factor is None:
            damping = HEURISTIC_DAMPING_SCALE * jnp.mean(lam)
        else:
            damping = damping_factor
        return jnp.reciprocal(lam + damping)

    @staticmethod
    def _as_count(value) -> jax.Array:
        wide = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        return jnp.asarray(value).reshape(()).astype(wide)


class Identity(FactorConfig, strategy="identity"):
    """No preconditioning: H ≈ I."""

    def prepare(self, factors, damping_factor, precondition_dtype) -> PreconditionState:
        del factors, damping_factor, precondition_dtype
        return PreconditionState()

    def precondition(self, gradient: jax.Array, state: PreconditionState) -> jax.Array:
        del state
        return gradient


class Diagonal(FactorConfig, strategy="diagonal"):
    """Diagonal Fisher: elementwise inverse of mean squared per-sample grads."""

    requires_lambda_matrices = True
    requires_lambda_matrices_for_precondition = True
    required_precondition_factors = (NUM_LAMBDA_PROCESSED, LAMBDA_MATRIX_NAME)

    def prepare(self, factors, damping_factor, precondition_dtype) -> PreconditionState:
        dtype = resolve_dtype(precondition_dtype)
        count = self._as_count(factors[NUM_LAMBDA_PROCESSED])
        lam = jnp.asarray(factors[LAMBDA_MATRIX_NAME]).astype(count.dtype) / count
        inv = self._damp_and_invert(lam, damping_factor)
        return PreconditionState(inverse_lambda=inv.astype(dtype))

    def precondition(self, gradient: jax.Array, state: PreconditionState) -> jax.Array:
        return gradient * state.inverse_lambda.astype(gradient.dtype)


class _EigenbasisSandwich(FactorConfig):
    """Shared device math for KFAC/EKFAC: Q_g ((Q_g^T G Q_a) ∘ Λ^-1) Q_a^T."""

    def precondition(self, gradient: jax.Array, state: PreconditionState) -> jax.Array:
        q_a = state.activation_eigenvectors.astype(gradient.dtype)
        q_g = state.gradient_eigenvectors.astype(gradient.dtype)
        inv_lambda = state.inverse_lambda.astype(gradient.dtype)
        rotated = jnp.einsum("po,boi,iq->bpq", q_g.T, gradient, q_a)
        rotated = rotated * inv_lambda
        return jnp.einsum("op,bpq,qi->boi", q_g, rotated, q_a.T)


class Kfac(_EigenbasisSandwich, strategy="kfac"):
    """K-FAC: Λ is the Kronecker outer product of the factor eigenvalues."""

    requires_covariance_matrices = True
    requires_eigendecomposition = True
    requires_eigendecomposition_for_precondition = True
    required_precondition_factors = (
        ACTIVATION_EIGENVALUES_NAME,
        GRADIENT_EIGENVALUES_NAME,
        ACTIVATION_EIGENVECTORS_NAME,
        GRADIENT_EIGENVECTORS_NAME,
    )

    def prepare(self, factors, damping_factor, precondition_dtype) -> PreconditionState:
        dtype = resolve_dtype(precondition_dtype)
        wide = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        act_ev = jnp.asarray(factors[ACTIVATION_EIGENVALUES_NAME]).astype(wide)
        grad_ev = jnp.asarray(factors[GRADIENT_EIGENVALUES_NAME]).astype(wide)
        lam = jnp.outer(grad_ev, act_ev)  # (out_dim, in_dim[+1])
        inv = self._damp_and_invert(lam, damping_factor)
        return PreconditionState(
            inverse_lambda=inv.astype(dtype),
            activation_eigenvectors=jnp.asarray(
                factors[ACTIVATION_EIGENVECTORS_NAME]
            ).astype(dtype),
            gradient_eigenvectors=jnp.asarray(
                factors[GRADIENT_EIGENVECTORS_NAME]
            ).astype(dtype),
        )


class Ekfac(_EigenbasisSandwich, strategy="ekfac"):
    """EK-FAC: eigenvalues corrected by fitted per-sample-gradient second moments."""

    requires_covariance_matrices = True
    requires_eigendecomposition = True
    requires_eigendecomposition_for_lambda = True
    requires_lambda_matrices = True
    requires_eigendecomposition_for_precondition = True
    requires_lambda_matrices_for_precondition = True
    required_precondition_factors = (
        NUM_LAMBDA_PROCESSED,
        LAMBDA_MATRIX_NAME,
        ACTIVATION_EIGENVECTORS_NAME,
        GRADIENT_EIGENVECTORS_NAME,
    )

    def prepare(self, factors, damping_factor, precondition_dtype) -> PreconditionState:
        dtype = resolve_dtype(precondition_dtype)
        count = self._as_count(factors[NUM_LAMBDA_PROCESSED])
        lam = jnp.asarray(factors[LAMBDA_MATRIX_NAME]).astype(count.dtype) / count
        inv = self._damp_and_invert(lam, damping_factor)
        return PreconditionState(
            inverse_lambda=inv.astype(dtype),
            activation_eigenvectors=jnp.asarray(
                factors[ACTIVATION_EIGENVECTORS_NAME]
            ).astype(dtype),
            gradient_eigenvectors=jnp.asarray(
                factors[GRADIENT_EIGENVECTORS_NAME]
            ).astype(dtype),
        )


def get_factor_config(strategy: str) -> FactorConfig:
    try:
        return _STRATEGIES[strategy]()
    except KeyError as exc:
        raise ValueError(
            f"Unknown strategy {strategy!r}; available: {sorted(_STRATEGIES)}."
        ) from exc
