/* Minimal MVE-compatible math::Matrix (row-major) for the baseline harness. */

#ifndef MATH_MATRIX_STUB_HEADER
#define MATH_MATRIX_STUB_HEADER

#include <algorithm>
#include <cmath>
#include <vector>

#include "math/vector.h"

namespace math {

template <typename T, int N, int M>
class Matrix
{
public:
    T m[N * M];  /* row-major */

    Matrix (void) = default;

    explicit Matrix (T const& value) { fill(value); }

    template <typename O>
    explicit Matrix (O const* values)
    {
        for (int i = 0; i < N * M; ++i)
            m[i] = static_cast<T>(values[i]);
    }

    template <typename O>
    Matrix (Matrix<O, N, M> const& other)
    {
        for (int i = 0; i < N * M; ++i)
            m[i] = static_cast<T>(other[i]);
    }

    Matrix& fill (T const& value)
    {
        std::fill(m, m + N * M, value);
        return *this;
    }

    int rows (void) const { return N; }
    int cols (void) const { return M; }

    T const& operator() (int row, int col) const { return m[row * M + col]; }
    T& operator() (int row, int col) { return m[row * M + col]; }
    T const& operator[] (int i) const { return m[i]; }
    T& operator[] (int i) { return m[i]; }

    T* operator* (void) { return m; }
    T const* operator* (void) const { return m; }

    T* begin (void) { return m; }
    T const* begin (void) const { return m; }
    T* end (void) { return m + N * M; }
    T const* end (void) const { return m + N * M; }

    Matrix<T, M, N> transposed (void) const
    {
        Matrix<T, M, N> r;
        for (int i = 0; i < N; ++i)
            for (int j = 0; j < M; ++j)
                r(j, i) = (*this)(i, j);
        return r;
    }

    Vector<T, N> operator* (Vector<T, M> const& vec) const
    {
        Vector<T, N> r;
        for (int i = 0; i < N; ++i)
        {
            T s = T(0);
            for (int j = 0; j < M; ++j)
                s += (*this)(i, j) * vec[j];
            r[i] = s;
        }
        return r;
    }

    template <int K>
    Matrix<T, N, K> operator* (Matrix<T, M, K> const& o) const
    {
        Matrix<T, N, K> r;
        for (int i = 0; i < N; ++i)
            for (int k = 0; k < K; ++k)
            {
                T s = T(0);
                for (int j = 0; j < M; ++j)
                    s += (*this)(i, j) * o(j, k);
                r(i, k) = s;
            }
        return r;
    }

    Matrix operator* (T const& s) const
    {
        Matrix r;
        for (int i = 0; i < N * M; ++i) r.m[i] = m[i] * s;
        return r;
    }
    Matrix operator/ (T const& s) const
    {
        Matrix r;
        for (int i = 0; i < N * M; ++i) r.m[i] = m[i] / s;
        return r;
    }
    Matrix operator+ (Matrix const& o) const
    {
        Matrix r;
        for (int i = 0; i < N * M; ++i) r.m[i] = m[i] + o.m[i];
        return r;
    }
    Matrix operator- (Matrix const& o) const
    {
        Matrix r;
        for (int i = 0; i < N * M; ++i) r.m[i] = m[i] - o.m[i];
        return r;
    }
    Matrix& operator+= (Matrix const& o)
    {
        for (int i = 0; i < N * M; ++i) m[i] += o.m[i];
        return *this;
    }
    Matrix& operator*= (T const& s)
    {
        for (int i = 0; i < N * M; ++i) m[i] *= s;
        return *this;
    }
};

typedef Matrix<float, 2, 2> Matrix2f;
typedef Matrix<float, 3, 3> Matrix3f;
typedef Matrix<float, 4, 4> Matrix4f;
typedef Matrix<double, 2, 2> Matrix2d;
typedef Matrix<double, 3, 3> Matrix3d;
typedef Matrix<double, 4, 4> Matrix4d;

template <typename T, int N, int M>
inline Matrix<T, N, M> operator* (T const& s, Matrix<T, N, M> const& mat)
{
    return mat * s;
}

/* Identity helper used as matrix_set_identity in MVE. */
template <typename T, int N>
inline void matrix_set_identity (Matrix<T, N, N>* mat)
{
    mat->fill(T(0));
    for (int i = 0; i < N; ++i)
        (*mat)(i, i) = T(1);
}

/* ---- raw-pointer helpers (MVE math/matrix_tools.h) ---- */

/* In-place transpose of a rows x cols row-major matrix. */
template <typename T>
inline void matrix_transpose (T* mat, int rows, int cols)
{
    std::vector<T> tmp(mat, mat + rows * cols);
    for (int r = 0; r < rows; ++r)
        for (int c = 0; c < cols; ++c)
            mat[c * rows + r] = tmp[r * cols + c];
}

/* out[rowsA x colsB] = A[rowsA x colsA] * B[colsA x colsB]. */
template <typename T>
inline void matrix_multiply (T const* A, int rowsA, int colsA,
    T const* B, int colsB, T* out)
{
    for (int i = 0; i < rowsA; ++i)
        for (int k = 0; k < colsB; ++k)
        {
            T s = T(0);
            for (int j = 0; j < colsA; ++j)
                s += A[i * colsA + j] * B[j * colsB + k];
            out[i * colsB + k] = s;
        }
}

}  // namespace math

#endif /* MATH_MATRIX_STUB_HEADER */
