/* Stub mex.h for building the reference solver core standalone (no MATLAB).
   The core sources include "mex.h" unconditionally (iLQG.c:16, back_pass.c:15)
   but, outside the MEX wrapper, only use it for the isNANorINF/INF macros --
   which our generated iLQG_problem.h defines via <math.h> instead. */
#ifndef STUB_MEX_H
#define STUB_MEX_H
#endif
