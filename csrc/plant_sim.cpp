// Native plant simulator: every registry plant (koopmanx/systems/library.py)
// as a C++ step map, for hardware-in-the-loop serving harnesses where the
// plant lives OUTSIDE the JAX graph (tools/bench_hil.py) and as an
// independent oracle for the Python/JAX integrators.
//
// Semantics mirror koopmanx/systems/base.py exactly:
//  - continuous plants advance by classic RK4 (data_generate.py:24-30
//    lineage) or the MATLAB k4-from-k1 variant
//    (Revise_2/Koopman_update.m:21-25), u held constant over the step;
//  - discrete plants (the tank cascades, Tank_System.m:9-10 lineage) apply
//    the exact map, integrator ignored;
//  - tank states are clamped non-negative after the step (x(x<0)=0,
//    Tank_System.m:40,45,211).
//
// All doubles; single-plant and strided-rollout entry points.

#include <cmath>
#include <cstring>

namespace {

constexpr int kMaxN = 8;

struct Spec {
  int n;          // state dim
  int m;          // input dim
  int ntheta;     // parameter count
  bool discrete;  // exact map (no integration)
  bool clamp;     // x >= 0 after step
};

// ids must match koopmanx/systems/native.py::_SYS
// 0 duffing  (d, k1, k3)           library.py:26-40
// 1 vanderpol(a, b, c, d)          library.py:52-67
// 2 tank     (c1..c4)   discrete   library.py:80-97
// 3 tank3    (c1..c6)   discrete   library.py:119-142
// 4 pendulum (a, b, k)             library.py::PENDULUM
// 5 toy1d    (a1, a2, a3)          library.py:154-167
// 6 approach3(a, b)                library.py:178-191
// 7 tank_mimo(c1..c5) m=2 discrete library.py::TANK_MIMO
const Spec kSpecs[] = {
    {2, 1, 3, false, false}, {2, 1, 4, false, false}, {2, 1, 4, true, true},
    {3, 1, 6, true, true},   {2, 1, 3, false, false}, {1, 1, 3, false, false},
    {2, 1, 2, false, false}, {2, 2, 5, true, true},
};
constexpr int kNumSys = sizeof(kSpecs) / sizeof(kSpecs[0]);

// dx = f(x, u, theta) for the continuous plants (all single-input)
void field(int sys, const double* th, const double* x, double u, double* dx) {
  switch (sys) {
    case 0:  // duffing: x1'=x2 ; x2' = d*x2 + k1*x1 + k3*x1^3 + u
      dx[0] = x[1];
      dx[1] = th[0] * x[1] + th[1] * x[0] + th[2] * x[0] * x[0] * x[0] + u;
      break;
    case 1:  // vdp: x1'=a*x2 ; x2' = b*x2 + c*x1^2*x2 + d*x1 + u
      dx[0] = th[0] * x[1];
      dx[1] = th[1] * x[1] + th[2] * x[0] * x[0] * x[1] + th[3] * x[0] + u;
      break;
    case 4:  // pendulum: x1'=x2 ; x2' = -a*sin(x1) - b*x2 + k*u
      dx[0] = x[1];
      dx[1] = -th[0] * std::sin(x[0]) - th[1] * x[1] + th[2] * u;
      break;
    case 5:  // toy1d: x' = a2*x^2 + a3*x^3 + a1*x + u
      dx[0] = th[1] * x[0] * x[0] + th[2] * x[0] * x[0] * x[0] +
              th[0] * x[0] + u;
      break;
    case 6:  // approach3: x1'=a*x1 ; x2' = b*x2 + x1^4 - 2*x1^2 + u
      dx[0] = th[0] * x[0];
      dx[1] = th[1] * x[1] + x[0] * x[0] * x[0] * x[0] -
              2.0 * x[0] * x[0] + u;
      break;
  }
}

// exact discrete maps (tanks)
void discrete_map(int sys, const double* th, const double* x,
                  const double* u, double* xn) {
  auto s = [](double v) { return std::sqrt(v > 0.0 ? v : 0.0); };
  if (sys == 2) {
    xn[0] = x[0] - th[0] * s(x[0]) + th[1] * u[0];
    xn[1] = x[1] + th[2] * s(x[0]) - th[3] * s(x[1]);
  } else if (sys == 3) {  // tank3
    xn[0] = x[0] - th[0] * s(x[0]) + th[1] * u[0];
    xn[1] = x[1] + th[2] * s(x[0]) - th[3] * s(x[1]);
    xn[2] = x[2] + th[4] * s(x[1]) - th[5] * s(x[2]);
  } else {  // tank_mimo: second pump feeds tank 2 directly
    xn[0] = x[0] - th[0] * s(x[0]) + th[1] * u[0];
    xn[1] = x[1] + th[2] * s(x[0]) - th[3] * s(x[1]) + th[4] * u[1];
  }
}

void step_impl(int sys, int integrator, double h, const double* th,
               const double* x, const double* u, double* xn) {
  const Spec& sp = kSpecs[sys];
  if (sp.discrete) {
    discrete_map(sys, th, x, u, xn);
  } else {
    const double u0 = u[0];
    double k1[kMaxN], k2[kMaxN], k3[kMaxN], k4[kMaxN], xs[kMaxN];
    const int n = sp.n;
    field(sys, th, x, u0, k1);
    for (int i = 0; i < n; ++i) xs[i] = x[i] + 0.5 * h * k1[i];
    field(sys, th, xs, u0, k2);
    for (int i = 0; i < n; ++i) xs[i] = x[i] + 0.5 * h * k2[i];
    field(sys, th, xs, u0, k3);
    // integrator 1 = the MATLAB quirk: k4 evaluated at x + h*k1
    const double* kbase = (integrator == 1) ? k1 : k3;
    for (int i = 0; i < n; ++i) xs[i] = x[i] + h * kbase[i];
    field(sys, th, xs, u0, k4);
    for (int i = 0; i < n; ++i)
      xn[i] = x[i] + (h / 6.0) * (k1[i] + 2.0 * k2[i] + 2.0 * k3[i] + k4[i]);
  }
  if (sp.clamp)
    for (int i = 0; i < sp.n; ++i)
      if (xn[i] < 0.0) xn[i] = 0.0;
}

}  // namespace

extern "C" {

int koopman_plant_dim(int sys) {
  if (sys < 0 || sys >= kNumSys) return -1;
  return kSpecs[sys].n;
}

// one step: x (n,), u (m,), x_next (n,). Returns 0 ok, -1 bad sys.
int koopman_plant_step(int sys, int integrator, double h, const double* theta,
                       const double* x, const double* u, double* x_next) {
  if (sys < 0 || sys >= kNumSys) return -1;
  step_impl(sys, integrator, h, theta, x, u, x_next);
  return 0;
}

// fleet step: B independent plants advance one period. theta is (B, ntheta)
// when per_plant_theta != 0, else one shared (ntheta,) row. x (B, n),
// u (B, m), x_next (B, n).
int koopman_plant_step_batch(int sys, int integrator, double h, int b,
                             const double* theta, int per_plant_theta,
                             const double* x, const double* u,
                             double* x_next) {
  if (sys < 0 || sys >= kNumSys) return -1;
  const Spec& sp = kSpecs[sys];
  for (int i = 0; i < b; ++i) {
    const double* th = per_plant_theta ? theta + i * sp.ntheta : theta;
    step_impl(sys, integrator, h, th, x + i * sp.n, u + i * sp.m,
              x_next + i * sp.n);
  }
  return 0;
}

// rollout: x0 (n,), u_seq (steps, m), x_out (steps, n) — state AFTER each
// step.
int koopman_plant_rollout(int sys, int integrator, double h, int steps,
                          const double* theta, const double* x0,
                          const double* u_seq, double* x_out) {
  if (sys < 0 || sys >= kNumSys) return -1;
  const int n = kSpecs[sys].n;
  const int m = kSpecs[sys].m;
  double cur[kMaxN];
  std::memcpy(cur, x0, n * sizeof(double));
  for (int t = 0; t < steps; ++t) {
    step_impl(sys, integrator, h, theta, cur, u_seq + t * m, x_out + t * n);
    std::memcpy(cur, x_out + t * n, n * sizeof(double));
  }
  return 0;
}

}  // extern "C"
