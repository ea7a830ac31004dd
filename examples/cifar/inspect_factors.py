"""Inspect fitted EKFAC factors (reference:
examples/cifar/inspect_factors.py, which loads lambda matrices and plots
their spectra).

Loads covariance/lambda factors for one module and prints eigenvalue
spectrum summaries — the text analogue of the reference's matplotlib plots
(this environment is headless).

    python examples/cifar/inspect_factors.py --factors_name ekfac \
        --module conv1 --output_dir ./influence_results/cifar
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from kronfluence_tpu import Analyzer


def describe(name, values):
    values = np.sort(np.asarray(values, dtype=np.float64))[::-1]
    total = values.sum() or 1.0
    top = values[: max(1, len(values) // 100)].sum() / total
    print(f"  {name}: dim={len(values)} max={values[0]:.3e} "
          f"median={np.median(values):.3e} min={values[-1]:.3e} "
          f"top-1%-mass={top:.3f}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--factors_name", default="ekfac")
    parser.add_argument("--analysis_name", default="cifar",
                        help="Analyzer name used by detect_mislabeled_dataset")
    parser.add_argument("--module", default=None,
                        help="module name (default: every tracked module)")
    parser.add_argument("--output_dir", default="./influence_results/cifar")
    args = parser.parse_args()

    factor_dir = (
        Path(args.output_dir) / args.analysis_name / f"factors_{args.factors_name}"
    )
    lambda_path = factor_dir / "lambda_matrix.safetensors"
    act_eig_path = factor_dir / "activation_eigenvalues.safetensors"
    grad_eig_path = factor_dir / "gradient_eigenvalues.safetensors"

    lambdas = Analyzer.load_file(lambda_path)
    modules = [args.module] if args.module else sorted(lambdas)
    act_eigs = Analyzer.load_file(act_eig_path) if act_eig_path.exists() else {}
    grad_eigs = Analyzer.load_file(grad_eig_path) if grad_eig_path.exists() else {}

    for module in modules:
        print(f"module {module}:")
        if module in act_eigs:
            describe("activation eigenvalues", act_eigs[module])
        if module in grad_eigs:
            describe("gradient eigenvalues", grad_eigs[module])
        lam = np.asarray(lambdas[module], dtype=np.float64).ravel()
        describe("lambda (eigenbasis second moments)", lam)


if __name__ == "__main__":
    main()
