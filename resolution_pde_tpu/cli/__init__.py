"""CLI entry points (L7): the reference's main_1d.py / main_2d.py /
autoregressive_eval.py / frequency_evaluation.py drivers, hydra-style:

    python -m resolution_pde_tpu.cli.main_1d model=ffno_1d \\
        dataset=ks_naive_true_mres1 training.epochs=100
"""
