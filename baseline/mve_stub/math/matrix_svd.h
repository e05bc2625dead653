/* Minimal matrix_pseudo_inverse for the baseline harness.
 *
 * The reference only applies it to the symmetric PSD normal-equation
 * matrix of the lighting fit (`lib/light_optimizer.cc:50-51`), so a
 * Jacobi eigendecomposition-based pseudo-inverse suffices.
 */

#ifndef MATH_MATRIX_SVD_STUB_HEADER
#define MATH_MATRIX_SVD_STUB_HEADER

#include <cmath>

#include "math/matrix.h"

namespace math {

/* Cyclic Jacobi eigendecomposition of a symmetric N x N matrix.
 * A = V diag(d) V^T on exit. */
template <typename T, int N>
inline void symmetric_jacobi_eig (Matrix<T, N, N> A,
    Matrix<T, N, N>* V, T* d)
{
    matrix_set_identity(V);
    for (int sweep = 0; sweep < 64; ++sweep)
    {
        T off = T(0);
        for (int p = 0; p < N; ++p)
            for (int q = p + 1; q < N; ++q)
                off += A(p, q) * A(p, q);
        if (off < T(1e-24))
            break;
        for (int p = 0; p < N; ++p)
            for (int q = p + 1; q < N; ++q)
            {
                if (std::abs(A(p, q)) < T(1e-30))
                    continue;
                T const theta = (A(q, q) - A(p, p)) / (T(2) * A(p, q));
                T const t = (theta >= T(0) ? T(1) : T(-1))
                    / (std::abs(theta) + std::sqrt(theta * theta + T(1)));
                T const c = T(1) / std::sqrt(t * t + T(1));
                T const s = t * c;
                for (int k = 0; k < N; ++k)
                {
                    T const akp = A(k, p), akq = A(k, q);
                    A(k, p) = c * akp - s * akq;
                    A(k, q) = s * akp + c * akq;
                }
                for (int k = 0; k < N; ++k)
                {
                    T const apk = A(p, k), aqk = A(q, k);
                    A(p, k) = c * apk - s * aqk;
                    A(q, k) = s * apk + c * aqk;
                }
                for (int k = 0; k < N; ++k)
                {
                    T const vkp = (*V)(k, p), vkq = (*V)(k, q);
                    (*V)(k, p) = c * vkp - s * vkq;
                    (*V)(k, q) = s * vkp + c * vkq;
                }
            }
    }
    for (int i = 0; i < N; ++i)
        d[i] = A(i, i);
}

template <typename T, int N>
inline void matrix_pseudo_inverse (Matrix<T, N, N> const& A,
    Matrix<T, N, N>* result)
{
    Matrix<T, N, N> V;
    T d[N];
    symmetric_jacobi_eig(A, &V, d);
    T dmax = T(0);
    for (int i = 0; i < N; ++i)
        dmax = std::max(dmax, std::abs(d[i]));
    T const cutoff = dmax * T(N) * T(1e-12);
    for (int i = 0; i < N; ++i)
        for (int j = 0; j < N; ++j)
        {
            T s = T(0);
            for (int k = 0; k < N; ++k)
                if (std::abs(d[k]) > cutoff)
                    s += V(i, k) * V(j, k) / d[k];
            (*result)(i, j) = s;
        }
}

}  // namespace math

#endif /* MATH_MATRIX_SVD_STUB_HEADER */
