#!/bin/bash
# Reproduction sweep — mirror of /root/reference/reproducibility/reproduce.sh:1-14,
# driving the plip_tpu CLI modules. Requires PC_* env vars (see config_example.env).

set -e

for dataset in kather pannuke digestpath wsss4luad_binary; do
  for alpha in 1.0 0.1 0.01 0.001; do
    for model in plip clip mudipath; do
      python -m plip_tpu.scripts.linear_probing_evaluation \
        --model_name "$model" --dataset "$dataset" --alpha "$alpha"
    done
  done
done

for dataset in kather pannuke digestpath wsss4luad_binary; do
  for model in plip clip; do
    python -m plip_tpu.scripts.zero_shot_evaluation --model_name "$model" --dataset "$dataset"
    python -m plip_tpu.scripts.retrieval_evaluation --model_name "$model" --dataset "$dataset"
  done
done
