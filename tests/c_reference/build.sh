#!/bin/sh
# Build the reference-parity oracle binary: generated CarParking problem code
# (gen_problem_c.py) + main.c + the UNMODIFIED reference solver core compiled
# straight from $REF_DIR (default /root/reference).
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
REF_DIR="${REF_DIR:-/root/reference}"
OUT_DIR="${1:-$HERE/build}"

mkdir -p "$OUT_DIR"
python "$HERE/gen_problem_c.py" "$OUT_DIR"

# -I order: generated dir first (iLQG_problem.h), fixture dir (stub mex.h),
# then the reference for the core headers.
# -DPRNT=printf: the MEX build injects mexPrintf here (make_iLQG.m:67,70)
gcc -O2 -DFULL_DDP=1 -DHAVE_OCTAVE -DMULTI_THREADED=0 -DPRNT=printf \
    -I"$OUT_DIR" -I"$HERE" -I"$REF_DIR" \
    "$HERE/main.c" "$OUT_DIR/iLQG_func.c" \
    "$REF_DIR/iLQG.c" "$REF_DIR/back_pass.c" "$REF_DIR/boxQP.c" \
    "$REF_DIR/cholesky.c" "$REF_DIR/line_search.c" "$REF_DIR/matMult.c" \
    "$REF_DIR/printMat.c" \
    -lm -o "$OUT_DIR/ilqg_car"

gcc -O2 -DFULL_DDP=1 -DHAVE_OCTAVE -DMULTI_THREADED=0 -DPRNT=printf \
    -I"$OUT_DIR" -I"$HERE" -I"$REF_DIR" \
    "$HERE/dump_derivs.c" "$OUT_DIR/iLQG_func.c" \
    "$REF_DIR/iLQG.c" "$REF_DIR/back_pass.c" "$REF_DIR/boxQP.c" \
    "$REF_DIR/cholesky.c" "$REF_DIR/line_search.c" "$REF_DIR/matMult.c" \
    "$REF_DIR/printMat.c" \
    -lm -o "$OUT_DIR/dump_derivs_car"
echo "built $OUT_DIR/ilqg_car $OUT_DIR/dump_derivs_car"
