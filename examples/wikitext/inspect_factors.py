"""Inspect fitted EKFAC factors: spectra, conditioning, per-module norms.

Reference analogue: examples/openwebtext/inspect_factors.py /
inspect_scores.py — load persisted factor artifacts and visualize/summarize
them. Prints a per-module table (eigenvalue range, condition number, lambda
mass) and optionally dumps spectra as .npy for plotting.

    python examples/wikitext/inspect_factors.py --factors_dir ./influence_results/wikitext/wikitext/factors_ekfac
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from kronfluence_tpu import Analyzer


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--factors_dir", required=True)
    parser.add_argument("--dump_spectra", default=None, help="dir to save .npy spectra")
    parser.add_argument("--output_dir", default=None, help="unused; smoke-test compat")
    return parser.parse_args()


def main():
    args = parse_args()
    d = Path(args.factors_dir)
    act_evals = Analyzer.load_file(d / "activation_eigenvalues.safetensors")
    grad_evals = Analyzer.load_file(d / "gradient_eigenvalues.safetensors")
    lam = Analyzer.load_file(d / "lambda_matrix.safetensors")
    num = Analyzer.load_file(d / "num_lambda_processed.safetensors")

    print(f"{'module':<28} {'act λmax':>10} {'act cond':>10} {'grad cond':>10} {'Λ mean':>10} {'Λ>damp %':>9}")
    for name in sorted(act_evals):
        a = np.asarray(act_evals[name], np.float64)
        g = np.asarray(grad_evals[name], np.float64)
        l = np.asarray(lam[name], np.float64) / float(np.asarray(num[name]).item())
        eps = 1e-12
        a_cond = float(a.max() / max(a.min(), eps * a.max()))
        g_cond = float(g.max() / max(g.min(), eps * g.max()))
        damping = 0.1 * l.mean()
        frac = float((l > damping).mean())
        print(
            f"{name:<28} {a.max():>10.3g} {a_cond:>10.3g} {g_cond:>10.3g} "
            f"{l.mean():>10.3g} {100 * frac:>8.1f}%"
        )
        if args.dump_spectra:
            out = Path(args.dump_spectra)
            out.mkdir(parents=True, exist_ok=True)
            np.save(out / f"{name.replace('/', '_')}_act_evals.npy", a)
            np.save(out / f"{name.replace('/', '_')}_grad_evals.npy", g)
    if args.dump_spectra:
        print(f"spectra saved under {args.dump_spectra}")


if __name__ == "__main__":
    main()
