/* Minimal MVE-compatible math::Vector for the baseline harness.
 *
 * API-compatible stand-in for MVE's math/vector.h covering exactly what
 * the reference smvs `lib/` uses (see baseline/README.md). Independent
 * implementation; row semantics match MVE (plain value array).
 */

#ifndef MATH_VECTOR_STUB_HEADER
#define MATH_VECTOR_STUB_HEADER

/* MVE math/defines.h macros */
#ifndef MATH_POW2
#   define MATH_POW2(x) ((x) * (x))
#   define MATH_POW3(x) ((x) * (x) * (x))
#   define MATH_PI 3.14159265358979323846
#   define MATH_SQRT2 1.41421356237309504880
#endif

#include <algorithm>
#include <cmath>
#include <cstddef>
#include <ostream>

namespace math {

template <typename T, int N>
class Vector
{
public:
    T v[N];

    Vector (void) = default;

    explicit Vector (T const& value)
    {
        fill(value);
    }

    /* From a raw array (possibly of another element type). */
    template <typename O>
    explicit Vector (O const* values)
    {
        for (int i = 0; i < N; ++i)
            v[i] = static_cast<T>(values[i]);
    }

    /* From a vector of another element type. */
    template <typename O>
    Vector (Vector<O, N> const& other)
    {
        for (int i = 0; i < N; ++i)
            v[i] = static_cast<T>(other[i]);
    }

    Vector (T const& x, T const& y)
    {
        static_assert(N == 2, "ctor arity");
        v[0] = x; v[1] = y;
    }

    Vector (T const& x, T const& y, T const& z)
    {
        static_assert(N == 3, "ctor arity");
        v[0] = x; v[1] = y; v[2] = z;
    }

    Vector (T const& x, T const& y, T const& z, T const& w)
    {
        static_assert(N == 4, "ctor arity");
        v[0] = x; v[1] = y; v[2] = z; v[3] = w;
    }

    Vector& fill (T const& value)
    {
        std::fill(v, v + N, value);
        return *this;
    }

    int dim (void) const { return N; }

    T const& operator[] (int i) const { return v[i]; }
    T& operator[] (int i) { return v[i]; }
    T const& operator() (int i) const { return v[i]; }
    T& operator() (int i) { return v[i]; }

    /* MVE idiom: *vec yields the raw data pointer. */
    T* operator* (void) { return v; }
    T const* operator* (void) const { return v; }

    T* begin (void) { return v; }
    T const* begin (void) const { return v; }
    T* end (void) { return v + N; }
    T const* end (void) const { return v + N; }

    T dot (Vector const& o) const
    {
        T s = T(0);
        for (int i = 0; i < N; ++i)
            s += v[i] * o.v[i];
        return s;
    }

    T square_norm (void) const { return dot(*this); }
    T norm (void) const { return std::sqrt(square_norm()); }

    T sum (void) const
    {
        T s = T(0);
        for (int i = 0; i < N; ++i)
            s += v[i];
        return s;
    }

    T abs_sum (void) const
    {
        T s = T(0);
        for (int i = 0; i < N; ++i)
            s += std::abs(v[i]);
        return s;
    }

    Vector& normalize (void)
    {
        T const n = norm();
        if (n > T(0))
            for (int i = 0; i < N; ++i)
                v[i] /= n;
        return *this;
    }

    Vector normalized (void) const
    {
        Vector r(*this);
        r.normalize();
        return r;
    }

    Vector cross (Vector const& o) const
    {
        static_assert(N == 3, "cross is 3D only");
        return Vector(v[1] * o.v[2] - v[2] * o.v[1],
                      v[2] * o.v[0] - v[0] * o.v[2],
                      v[0] * o.v[1] - v[1] * o.v[0]);
    }

    T maximum (void) const { return *std::max_element(v, v + N); }
    T minimum (void) const { return *std::min_element(v, v + N); }

    /* arithmetic */
    Vector operator- (void) const
    {
        Vector r;
        for (int i = 0; i < N; ++i) r.v[i] = -v[i];
        return r;
    }
    Vector operator+ (Vector const& o) const
    {
        Vector r;
        for (int i = 0; i < N; ++i) r.v[i] = v[i] + o.v[i];
        return r;
    }
    Vector operator- (Vector const& o) const
    {
        Vector r;
        for (int i = 0; i < N; ++i) r.v[i] = v[i] - o.v[i];
        return r;
    }
    Vector& operator+= (Vector const& o)
    {
        for (int i = 0; i < N; ++i) v[i] += o.v[i];
        return *this;
    }
    Vector& operator-= (Vector const& o)
    {
        for (int i = 0; i < N; ++i) v[i] -= o.v[i];
        return *this;
    }
    Vector operator+ (T const& s) const
    {
        Vector r;
        for (int i = 0; i < N; ++i) r.v[i] = v[i] + s;
        return r;
    }
    Vector operator* (T const& s) const
    {
        Vector r;
        for (int i = 0; i < N; ++i) r.v[i] = v[i] * s;
        return r;
    }
    Vector operator/ (T const& s) const
    {
        Vector r;
        for (int i = 0; i < N; ++i) r.v[i] = v[i] / s;
        return r;
    }
    Vector& operator*= (T const& s)
    {
        for (int i = 0; i < N; ++i) v[i] *= s;
        return *this;
    }
    Vector& operator/= (T const& s)
    {
        for (int i = 0; i < N; ++i) v[i] /= s;
        return *this;
    }
    bool operator== (Vector const& o) const
    {
        for (int i = 0; i < N; ++i)
            if (v[i] != o.v[i])
                return false;
        return true;
    }
    bool operator!= (Vector const& o) const { return !(*this == o); }
};

template <typename T, int N>
inline Vector<T, N> operator* (T const& s, Vector<T, N> const& vec)
{
    return vec * s;
}

template <typename T, int N>
inline std::ostream& operator<< (std::ostream& os, Vector<T, N> const& vec)
{
    for (int i = 0; i < N; ++i)
        os << vec[i] << (i + 1 < N ? " " : "");
    return os;
}

typedef Vector<float, 2> Vec2f;
typedef Vector<float, 3> Vec3f;
typedef Vector<float, 4> Vec4f;
typedef Vector<double, 2> Vec2d;
typedef Vector<double, 3> Vec3d;
typedef Vector<double, 4> Vec4d;
typedef Vector<int, 2> Vec2i;
typedef Vector<int, 3> Vec3i;
typedef Vector<std::size_t, 2> Vec2st;
typedef Vector<std::size_t, 3> Vec3st;

/* ---- small function helpers (MVE math/functions.h, math/accum.h) ---- */

template <typename T>
inline T clamp (T const& v, T const& lo, T const& hi)
{
    return v < lo ? lo : (v > hi ? hi : v);
}

template <typename T>
inline T gaussian (T const& x, T const& sigma)
{
    return std::exp(-(x * x) / (T(2) * sigma * sigma));
}

template <typename T>
inline T gaussian_xx (T const& xx, T const& sigma)
{
    return std::exp(-xx / (T(2) * sigma * sigma));
}

template <typename T>
inline T gaussian_2d (T const& x, T const& y,
    T const& sigma_x, T const& sigma_y)
{
    return std::exp(-(x * x) / (T(2) * sigma_x * sigma_x)
                    - (y * y) / (T(2) * sigma_y * sigma_y));
}

/* Weighted accumulator (MVE math::Accum). */
template <typename T>
class Accum
{
public:
    T v;
    float w;

    explicit Accum (T const& init) : v(init), w(0.0f) {}

    void add (T const& value, float weight)
    {
        v += value * weight;
        w += weight;
    }

    T normalized (void) const { return v / w; }
    T normalized (float weight) const { return v / weight; }
};

}  // namespace math

#endif /* MATH_VECTOR_STUB_HEADER */
