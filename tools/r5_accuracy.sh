#!/bin/bash
# Round-5 accuracy pipeline (VERDICT r4 items 2-5). Sequential TPU runs with
# marker files so a tunnel death or restart resumes where it left off.
#
#   bash tools/r5_accuracy.sh [phase...]   # default: all phases in order
#
# Artifacts: /tmp/r5/** ; summary jsons per phase.
set -u
cd "$(dirname "$0")/.."
export HF_HUB_OFFLINE=1 TRANSFORMERS_OFFLINE=1
REF=${REFERENCE_DIR:-/root/reference}
R5=/tmp/r5
mkdir -p $R5

log() { echo "[r5 $(date +%H:%M:%S)] $*"; }
done_marker() { touch "$R5/.done_$1"; log "phase $1 done"; }
is_done() { [ -f "$R5/.done_$1" ]; }

phase_tree() {
    is_done tree && return 0
    log "P0: user tree (processed CSVs + embedding build on TPU)"
    mkdir -p $R5/user_tree/data/processed
    cp $REF/python/data/processed/*.csv $R5/user_tree/data/processed/
    python -m eeg_multimodal_tpu.cli embed --data_root $R5/user_tree || return 1
    done_marker tree
}

phase_distill() {
    is_done distill && return 0
    log "P1: distilled act trees (full fit + half-fit leakage control)"
    python -m eeg_multimodal_tpu.cli distill --data_root $R5/user_tree \
        --out $R5/tree_dist \
        --real_test_pickle $REF/feature/action/test_clip_v2.pickle || return 1
    python -m eeg_multimodal_tpu.cli distill --data_root $R5/user_tree \
        --out $R5/tree_dist_half --fit_fraction 0.5 \
        --real_test_pickle $REF/feature/action/test_clip_v2.pickle || return 1
    done_marker distill
}

phase_base() {
    is_done base && return 0
    log "P2: baseline MLM+row-reg encoder + flagship 120ep (pipeline path)"
    python -m eeg_multimodal_tpu.cli pretrain --data_root $R5/tree_dist \
        --out $R5/base --row_reg_weight 1.0 --mlm_steps 8000 \
        --epochs 120 > $R5/base.log 2>&1 || return 1
    tail -2 $R5/base.log
    done_marker base
}

phase_half() {
    is_done half && return 0
    log "P2b: half-fit-distiller control flagship (VERDICT #4)"
    # Reuses base's MLM+row-reg encoder: the pretext consumes only the
    # text side (mlm.py::pretrain_finetune_mlm loads act features only via
    # --clip_weight), and the two distilled trees differ only in act img
    # pickles — so the encoders are identical and the half arm isolates
    # exactly the distiller-fit variable.
    python -m eeg_multimodal_tpu.cli pretrain --data_root $R5/tree_dist_half \
        --out $R5/half --row_reg_weight 1.0 \
        --bert_ckpt $R5/base/bert_mlm.pickle \
        --epochs 120 > $R5/half.log 2>&1 || return 1
    tail -2 $R5/half.log
    done_marker half
}

phase_pretext() {
    # NDP pretext grid (VERDICT #3): each variant = pretrain + NDP finetune
    # combined variant first: if the session ends mid-grid the most
    # informative point (all three pretexts at the doubled budget) exists
    for v in aug_ww_clip aug20 ww clip; do
        is_done "ndp_$v" && continue
        case $v in
            aug20)       X="--aug_factor 20";;
            ww)          X="--whole_word";;
            clip)        X="--clip_weight 1.0";;
            aug_ww_clip) X="--aug_factor 20 --whole_word --clip_weight 1.0 --mlm_steps 16000";;
        esac
        log "P3: NDP pretext variant $v ($X)"
        python -m eeg_multimodal_tpu.cli pretrain --data_root $R5/tree_dist \
            --out $R5/ndp_$v --row_reg_weight 1.0 --mlm_steps 8000 \
            --dp_mode NDP --epochs 120 $X > $R5/ndp_$v.log 2>&1 || return 1
        tail -2 $R5/ndp_$v.log
        touch "$R5/.done_ndp_$v"
    done
    # NDP baseline from the shared base encoder (no extra pretrain)
    if ! is_done ndp_base; then
        log "P3: NDP baseline finetune from base encoder"
        python -m eeg_multimodal_tpu.cli pretrain --data_root $R5/tree_dist \
            --out $R5/ndp_base --bert_ckpt $R5/base/bert_mlm.pickle \
            --row_reg_weight 1.0 --dp_mode NDP --epochs 120 \
            > $R5/ndp_base.log 2>&1 || return 1
        tail -2 $R5/ndp_base.log
        touch "$R5/.done_ndp_base"
    fi
}

phase_sr() {
    is_done sr && return 0
    log "P4: SR/bf16-moment validation, 3 seeds x {bf16, f32} (VERDICT #2)"
    # bf16 arm = the FULL bench configuration (bf16 SR moments + carried
    # bf16 param copy); f32 arm = the clean seed-band control matching the
    # frontier config of ACCURACY 13 (f32 moments, no precast).
    for seed in 980616 1 2; do
        for m in bf16 f32; do
            PRECAST=""; [ "$m" = bf16 ] && PRECAST=1
            EEG_VALIDATE_PRECAST=$PRECAST python tools/validate_bf16_moments.py \
                --run_dir $R5/base --data_root $R5/tree_dist \
                --out $R5/sr_validation --seed $seed --moments $m \
                --epochs 50 >> $R5/sr.log 2>&1 || return 1
        done
    done
    done_marker sr
}

phase_modal3() {
    is_done modal3 && return 0
    log "P5: CompareModal ti driver path, 3 seeds (VERDICT #5)"
    python tools/r5_modal_seeds.py --run_dir $R5/base \
        --data_root $R5/tree_dist --out $R5/modal3 \
        > $R5/modal3.log 2>&1 || return 1
    tail -4 $R5/modal3.log
    done_marker modal3
}

PHASES=${*:-"tree distill base half sr modal3 pretext"}
for ph in $PHASES; do
    phase_$ph || { log "phase $ph FAILED"; exit 1; }
done
log "all requested phases complete"
