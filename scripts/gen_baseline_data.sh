#!/bin/bash
# Materialize the datasets the BASELINE sweep families read (real TPU).
# KS: visc 0.075 tree @ [512..32] (ks_naive_true_mres1 + ks_s4 + ks_naive)
# Burgers: PDEBench layout @1024 nu=0.001 (burger_naive)
# NS: ns_256_1e-03.h5 (ns_naive + ns_naive_true_mres1 + cno resize)
set -e
cd /root/repo
python -m resolution_pde_tpu.cli.generate_data pde=ks out=data/ks \
    n=512 resolutions=[512,256,128,64,32] n_snapshots=51 \
    viscosity=0.075 seed=11
python -m resolution_pde_tpu.cli.generate_data pde=burgers \
    out=data/burgers n=512 resolutions=[1024] n_snapshots=51 \
    viscosity=0.001 seed=12
python -m resolution_pde_tpu.cli.generate_data pde=ns out=data/ns \
    n=128 resolutions=[256] n_snapshots=26 viscosity=1e-03 seed=13
echo "ALL DATA GENERATED"
