#!/bin/bash
# OOM spike hunt (VERDICT r18 #1c): the r18 driver bench died with JVM
# exit 52 (SparkUncaughtExceptionHandler on OutOfMemoryError) ~169s in,
# somewhere in the alphabetical q_c*/q_d* region, ~1-in-5 at the
# 8g/local[32] config. Reproduce it deterministically enough to NAME the
# query by looping the same alphabetical prefix the driver runs (all
# memo prebuilds + queries through q_dedup_substring) under a REDUCED
# heap. With the r19 per-query partial flush + `[bench] running:` marker,
# a crashed iteration names its killer in the log tail and keeps every
# completed median in the partial JSON.
#
# Usage: tools/oom_probe.sh [iterations] [heap]   (default 8 iterations, 6g)
set -u
cd "$(dirname "$0")/.."
ITERS=${1:-8}
HEAP=${2:-6g}
MEMOS=_memo_ngram_pairs,_memo_minhash_sigs,_memo_simhash_fps,_memo_ngram_postings,_memo_cc_prior,_memo_curate_pairs,_memo_curate_fates,_memo_incr_prior,_memo_incr_postings,_memo_incr_hashes,_memo_incr_labels,_memo_pq_codebooks,_memo_ivf_centroids,_memo_bpe_merges,_memo_unigram_model,_memo_copurchase,_memo_influence
PREFIX=q_agg_hash,q_ann_bucket_verify,q_bpe_encode,q_bpe_merges,q_caught_up,q_chunk_overlap,q_cohort_retention,q_commit_ledger,q_contamination,q_corpus_delta,q_corpus_report,q_corr_stats,q_cube_revenue,q_curate,q_curation_report,q_curriculum,q_data_split,q_decontaminate,q_dedup_canonical,q_dedup_clusters,q_dedup_clusters_incr,q_dedup_exact,q_dedup_exact_incr,q_dedup_latest,q_dedup_lines,q_dedup_minhash,q_dedup_minhash_incr,q_dedup_minhash_verify,q_dedup_ngram_incr,q_dedup_ngram_jaccard,q_dedup_semantic,q_dedup_simhash,q_dedup_simhash_incr,q_dedup_simhash_verify,q_dedup_substring
for i in $(seq 1 "$ITERS"); do
  echo "=== oom_probe iteration $i (heap $HEAP) ==="
  SPARK_DRIVER_MEM=$HEAP \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ONLY="$MEMOS,$PREFIX" \
  SPARK_GRAFT_BENCH_OUT=/tmp/oom_probe_$i.json \
    sbt -batch "runMain graft.Bench" >/tmp/oom_probe_$i.log 2>&1
  rc=$?
  last=$(grep -o '\[bench\] running: [a-z_0-9]*' /tmp/oom_probe_$i.log | tail -1)
  echo "iteration $i rc=$rc last-marker='$last'"
  if [ $rc -ne 0 ]; then
    echo "--- tail of crashed iteration $i ---"
    tail -c 1200 /tmp/oom_probe_$i.log
  fi
done
