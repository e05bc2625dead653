/* Baseline driver: runs the REFERENCE smvs depth pipeline (compiled
 * unmodified from /root/reference/lib against the minimal MVE-compatible
 * stubs in mve_stub/) on the same synthetic scenes bench.py measures,
 * single-threaded — the reference's per-view work unit
 * (`app/smvsrecon.cc:652-735` runs exactly one view per thread).
 *
 * Mirrors the app's per-view task: SGM init (scale 1, 128 steps, fixed
 * sweep range like bench.py) written as `smvs-sgm`, then
 * DepthOptimizer::optimize with bench.py's options. With --init FILE the
 * SGM stage is replaced by a provided z-depth initialization (written as
 * the `smvs-sgm` embedding), and --shading enables the reference's -S
 * mode (linear image + SH lighting + shading term).
 *
 * Prints one JSON line with stage timings + accuracy.
 */

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <iostream>
#include <string>
#include <vector>

#include "mve/camera.h"
#include "mve/depthmap.h"
#include "mve/image.h"
#include "mve/view.h"

#include "depth_optimizer.h"
#include "sgm_stereo.h"
#include "stereo_view.h"

namespace {

double
now_sec (void)
{
    return std::chrono::duration<double>(
        std::chrono::steady_clock::now().time_since_epoch()).count();
}

mve::ByteImage::Ptr
load_img (std::string const& path)
{
    std::ifstream f(path, std::ios::binary);
    if (!f)
        throw std::runtime_error("cannot open " + path);
    int32_t w = 0, h = 0;
    f.read(reinterpret_cast<char*>(&w), 4);
    f.read(reinterpret_cast<char*>(&h), 4);
    mve::ByteImage::Ptr img = mve::ByteImage::create(w, h, 1);
    f.read(reinterpret_cast<char*>(img->begin()), std::size_t(w) * h);
    return img;
}

mve::CameraInfo
load_cam (std::string const& path)
{
    std::ifstream f(path);
    if (!f)
        throw std::runtime_error("cannot open " + path);
    mve::CameraInfo cam;
    f >> cam.flen;
    for (int i = 0; i < 9; ++i)
        f >> cam.rot[i];
    for (int i = 0; i < 3; ++i)
        f >> cam.trans[i];
    return cam;
}

void
save_f32 (std::string const& path, mve::FloatImage::ConstPtr img)
{
    std::ofstream f(path, std::ios::binary);
    int32_t const w = img->width(), h = img->height();
    f.write(reinterpret_cast<char const*>(&w), 4);
    f.write(reinterpret_cast<char const*>(&h), 4);
    f.write(reinterpret_cast<char const*>(&img->at(0)),
        std::size_t(w) * h * 4);
}

std::vector<double>
load_f64 (std::string const& path, int* w_out, int* h_out)
{
    std::ifstream f(path, std::ios::binary);
    if (!f)
        throw std::runtime_error("cannot open " + path);
    int32_t w = 0, h = 0;
    f.read(reinterpret_cast<char*>(&w), 4);
    f.read(reinterpret_cast<char*>(&h), 4);
    std::vector<double> out(std::size_t(w) * h);
    f.read(reinterpret_cast<char*>(out.data()), out.size() * 8);
    *w_out = w;
    *h_out = h;
    return out;
}

mve::View::Ptr
make_view (std::string const& dir, int id)
{
    mve::View::Ptr view = mve::View::create();
    view->set_id(id);
    view->set_camera(load_cam(dir + "/view" + std::to_string(id) + ".cam"));
    view->set_image(load_img(dir + "/view" + std::to_string(id) + ".img"),
        "undistorted");
    return view;
}

}  // namespace

int
main (int argc, char** argv)
{
    std::string dir = "/tmp/smvs_baseline_scene";
    float sgm_min = 3.5f, sgm_max = 9.5f;
    int min_scale = 2;
    int debug_lvl = 0;
    int sgm_scale = 1;
    int num_iters = 5;
    int main_id = 1;
    bool shading = false;
    double alpha = 0.01;
    double light_reg = 0.0;
    std::string init_file;
    std::string dump_file;
    std::string dump_sgm_file;
    std::vector<int> sub_ids;

    for (int i = 1; i < argc; ++i)
    {
        std::string const a = argv[i];
        if (a == "--shading") shading = true;
        else if (a == "--init") init_file = argv[++i];
        else if (a == "--dump") dump_file = argv[++i];
        else if (a == "--dump-sgm") dump_sgm_file = argv[++i];
        else if (a == "--min-depth") sgm_min = std::atof(argv[++i]);
        else if (a == "--max-depth") sgm_max = std::atof(argv[++i]);
        else if (a == "--min-scale") min_scale = std::atoi(argv[++i]);
        else if (a == "--debug") debug_lvl = std::atoi(argv[++i]);
        else if (a == "--sgm-scale") sgm_scale = std::atoi(argv[++i]);
        else if (a == "--iters") num_iters = std::atoi(argv[++i]);
        else if (a == "--main") main_id = std::atoi(argv[++i]);
        else if (a == "--sub") sub_ids.push_back(std::atoi(argv[++i]));
        else if (a == "--alpha") alpha = std::atof(argv[++i]);
        else if (a == "--light-reg") light_reg = std::atof(argv[++i]);
        else dir = a;
    }
    if (sub_ids.empty())
        sub_ids.push_back(0);

    mve::View::Ptr view_main = make_view(dir, main_id);
    smvs::StereoView::Ptr main_view = smvs::StereoView::create(
        view_main, "undistorted", shading, false);
    std::vector<smvs::StereoView::Ptr> sub_views;
    for (int id : sub_ids)
        sub_views.push_back(
            smvs::StereoView::create(make_view(dir, id), "undistorted"));

    /* ---- init: SGM (app/smvsrecon.cc:347-384) or provided depth ---- */
    double const t0 = now_sec();
    if (init_file.empty())
    {
        smvs::SGMStereo::Options sgm_opts;
        sgm_opts.scale = sgm_scale;
        sgm_opts.num_steps = 128;
        sgm_opts.min_depth = sgm_min;
        sgm_opts.max_depth = sgm_max;
        mve::FloatImage::Ptr sgm_depth = smvs::SGMStereo::reconstruct(
            sgm_opts, main_view, sub_views[0], nullptr);
        if (sub_views.size() > 1)
        {
            mve::FloatImage::Ptr d2 = smvs::SGMStereo::reconstruct(
                sgm_opts, main_view, sub_views[1], nullptr);
            for (int p = 0; p < sgm_depth->get_pixel_amount(); ++p)
            {
                if (d2->at(p) == 0.0f)
                    continue;
                if (sgm_depth->at(p) == 0.0f)
                    sgm_depth->at(p) = d2->at(p);
                else
                    sgm_depth->at(p) = (sgm_depth->at(p) + d2->at(p)) * 0.5f;
            }
        }
        main_view->write_depth_to_view(sgm_depth, "smvs-sgm");
        if (!dump_sgm_file.empty())
            save_f32(dump_sgm_file, sgm_depth);
        if (std::getenv("SMVS_BASELINE_DEBUG") != nullptr)
        {
            std::size_t nz = 0;
            double sum = 0.0;
            for (int p = 0; p < sgm_depth->get_pixel_amount(); ++p)
                if (sgm_depth->at(p) > 0.0f)
                {
                    ++nz;
                    sum += sgm_depth->at(p);
                }
            std::fprintf(stderr,
                "sgm: %dx%d nonzero=%zu (%.1f%%) mean=%.3f\n",
                sgm_depth->width(), sgm_depth->height(), nz,
                100.0 * nz / sgm_depth->get_pixel_amount(),
                nz ? sum / nz : 0.0);
            int gw2 = 0, gh2 = 0;
            std::vector<double> gt2 = load_f64(
                dir + "/gt" + std::to_string(main_id) + ".bin", &gw2, &gh2);
            int const fx = gw2 / sgm_depth->width();
            std::vector<double> r2;
            for (int y = 0; y < sgm_depth->height(); ++y)
                for (int x = 0; x < sgm_depth->width(); ++x)
                {
                    float const d = sgm_depth->at(x, y, 0);
                    double const g =
                        gt2[std::size_t(y) * fx * gw2 + x * fx];
                    if (d > 0.0f && g > 0.0)
                        r2.push_back(std::abs(double(d) - g) / g);
                }
            std::sort(r2.begin(), r2.end());
            std::fprintf(stderr, "sgm med rel err vs gt: %.4f\n",
                r2.empty() ? -1.0 : r2[r2.size() / 2]);
        }
    }
    else
    {
        int iw = 0, ih = 0;
        std::vector<double> init = load_f64(init_file, &iw, &ih);
        mve::FloatImage::Ptr d = mve::FloatImage::create(iw, ih, 1);
        for (std::size_t p = 0; p < init.size(); ++p)
            d->at(p) = float(init[p]);
        main_view->write_depth_to_view(d, "smvs-sgm");
    }
    double const t_sgm = now_sec() - t0;

    /* ---- depth optimization ---- */
    double const t1 = now_sec();
    smvs::DepthOptimizer::Options opts;
    opts.regularization = alpha;
    opts.light_surf_regularization = light_reg;
    opts.num_iterations = num_iters;
    opts.min_scale = min_scale;
    opts.use_sgm = true;
    opts.use_shading = shading;
    opts.full_optimization = false;
    opts.debug_lvl = debug_lvl;
    opts.output_name = "smvs-B0";
    smvs::DepthOptimizer optimizer(main_view, sub_views,
        mve::Bundle::ConstPtr(nullptr), opts);
    optimizer.optimize();
    mve::FloatImage::Ptr depth = optimizer.get_depth();
    double const t_opt = now_sec() - t1;
    if (!dump_file.empty())
        save_f32(dump_file, depth);

    /* ---- accuracy vs analytic ground truth ---- */
    int gw = 0, gh = 0;
    std::vector<double> gt = load_f64(
        dir + "/gt" + std::to_string(main_id) + ".bin", &gw, &gh);
    std::vector<double> rel;
    std::size_t covered = 0;
    for (int p = 0; p < depth->get_pixel_amount(); ++p)
    {
        float const d = depth->at(p);
        if (d <= 0.0f)
            continue;
        ++covered;
        double const g = gt[p];
        if (g > 0.0)
            rel.push_back(std::abs(double(d) - g) / g);
    }
    std::sort(rel.begin(), rel.end());
    double const med = rel.empty() ? -1.0 : rel[rel.size() / 2];
    double const coverage =
        double(covered) / double(depth->get_pixel_amount());
    double const mp = double(depth->get_pixel_amount()) / 1e6;

    std::printf(
        "{\"w\": %d, \"h\": %d, \"t_sgm_s\": %.3f, \"t_opt_s\": %.3f, "
        "\"mp\": %.4f, \"mps_single_thread\": %.5f, \"coverage\": %.4f, "
        "\"median_rel_err\": %.6f, \"shading\": %d, \"n_sub\": %zu}\n",
        depth->width(), depth->height(), t_sgm, t_opt, mp,
        mp / (t_sgm + t_opt), coverage, med, int(shading),
        sub_views.size());
    return 0;
}
