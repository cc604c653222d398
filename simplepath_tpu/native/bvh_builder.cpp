// Native wide-BVH builder over triangle AABBs.
//
// TPU-native-framework host component: replaces the reference's recursive
// pointer-based builder (/root/reference/shapes/BVHAccelerator.h:160-211)
// with an iterative, allocation-light builder that emits packed flattened
// SoA node arrays ready for device upload.  Used for large meshes
// (lucy-class, tens of millions of triangles) where the numpy builder's
// Python-level recursion is the bottleneck; scene/bvh.py keeps a numpy
// fallback.
//
// Topology: log2(W) levels of median split per node (widest centroid axis,
// nth_element partition) -> branching factor W, leaves <= leaf_size.
// (Binned SAH was tried and measured within bench noise of median while
// building ~2-3x slower -- see PERF.md; median kept.)
// Output layout matches scene/types.py BVHArrays:
//   child_box  [N,W,6]  (lo.xyz, hi.xyz; empty slots inverted)
//   child_meta [N,W,3]  (node, first, count)
// C ABI, called from Python via ctypes.

#include <algorithm>
#include <cstddef>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct BuildContext {
    const float* lo;
    const float* hi;
    std::vector<float> centroid;
    std::vector<int32_t> order;
    std::vector<float> child_box;     // [N,W,6]
    std::vector<int32_t> child_meta;  // [N,W,3]
    std::vector<int32_t> prim_order;
    int leaf_size;
    int width;
};

int alloc_node(BuildContext& ctx) {
    const int id = static_cast<int>(ctx.child_meta.size() / (3 * ctx.width));
    for (int w = 0; w < ctx.width; ++w) {
        ctx.child_box.push_back(3.4e38f);
        ctx.child_box.push_back(3.4e38f);
        ctx.child_box.push_back(3.4e38f);
        ctx.child_box.push_back(-3.4e38f);
        ctx.child_box.push_back(-3.4e38f);
        ctx.child_box.push_back(-3.4e38f);
        ctx.child_meta.push_back(-1);
        ctx.child_meta.push_back(0);
        ctx.child_meta.push_back(0);
    }
    return id;
}

int32_t* median_split(BuildContext& ctx, int32_t* first, int32_t* last,
                      int axis) {
    int32_t* mid = first + (last - first) / 2;
    std::nth_element(first, mid, last, [&ctx, axis](int32_t a, int32_t b) {
        return ctx.centroid[static_cast<size_t>(a) * 3 + axis]
             < ctx.centroid[static_cast<size_t>(b) * 3 + axis];
    });
    return mid;
}

int32_t* median_split_widest(BuildContext& ctx, int32_t* first, int32_t* last) {
    float cmin[3] = {3.4e38f, 3.4e38f, 3.4e38f};
    float cmax[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
    for (int32_t* p = first; p != last; ++p) {
        const float* c = &ctx.centroid[static_cast<size_t>(*p) * 3];
        for (int k = 0; k < 3; ++k) {
            cmin[k] = std::min(cmin[k], c[k]);
            cmax[k] = std::max(cmax[k], c[k]);
        }
    }
    int axis = 0;
    float best = cmax[0] - cmin[0];
    for (int k = 1; k < 3; ++k) {
        const float e = cmax[k] - cmin[k];
        if (e > best) { best = e; axis = k; }
    }
    return median_split(ctx, first, last, axis);
}

struct WorkItem { int node; int32_t* first; int32_t* last; };

void fill_node(BuildContext& ctx, int node_id, int32_t* first, int32_t* last,
               std::vector<WorkItem>& stack) {
    const int W = ctx.width;
    // split into up to W groups via log2(W) median-split levels
    std::vector<int32_t*> cuts = {first, last};
    int levels = 0;
    for (int w = W; w > 1; w >>= 1) ++levels;
    for (int l = 0; l < levels; ++l) {
        std::vector<int32_t*> next_cuts;
        for (size_t i = 0; i + 1 < cuts.size(); ++i) {
            int32_t* a = cuts[i];
            int32_t* b = cuts[i + 1];
            next_cuts.push_back(a);
            // stop splitting a group once it fits in a leaf: keeps leaves
            // near-full instead of shattering into W half-empty leaves
            if (b - a > ctx.leaf_size) next_cuts.push_back(median_split_widest(ctx, a, b));
        }
        next_cuts.push_back(last);
        cuts = std::move(next_cuts);
    }

    int w = 0;
    for (size_t i = 0; i + 1 < cuts.size() && w < W; ++i) {
        int32_t* gfirst = cuts[i];
        int32_t* glast = cuts[i + 1];
        if (glast - gfirst <= 0) continue;
        const size_t bbase = (static_cast<size_t>(node_id) * W + w) * 6;
        float blo[3] = {3.4e38f, 3.4e38f, 3.4e38f};
        float bhi[3] = {-3.4e38f, -3.4e38f, -3.4e38f};
        for (int32_t* p = gfirst; p != glast; ++p) {
            const float* l = &ctx.lo[static_cast<size_t>(*p) * 3];
            const float* h = &ctx.hi[static_cast<size_t>(*p) * 3];
            for (int k = 0; k < 3; ++k) {
                blo[k] = std::min(blo[k], l[k]);
                bhi[k] = std::max(bhi[k], h[k]);
            }
        }
        std::memcpy(&ctx.child_box[bbase], blo, sizeof blo);
        std::memcpy(&ctx.child_box[bbase + 3], bhi, sizeof bhi);

        const size_t mbase = (static_cast<size_t>(node_id) * W + w) * 3;
        if (glast - gfirst <= ctx.leaf_size) {
            ctx.child_meta[mbase + 0] = -1;
            ctx.child_meta[mbase + 1] = static_cast<int32_t>(ctx.prim_order.size());
            ctx.child_meta[mbase + 2] = static_cast<int32_t>(glast - gfirst);
            ctx.prim_order.insert(ctx.prim_order.end(), gfirst, glast);
        } else {
            const int cid = alloc_node(ctx);
            ctx.child_meta[mbase + 0] = cid;
            stack.push_back({cid, gfirst, glast});
        }
        ++w;
    }
}

BuildContext* g_last = nullptr;

}  // namespace

extern "C" {

int32_t bvh_build(const float* lo, const float* hi, int32_t n,
                  int32_t leaf_size, int32_t width) {
    delete g_last;
    auto* ctx = new BuildContext();
    g_last = ctx;
    ctx->lo = lo;
    ctx->hi = hi;
    ctx->leaf_size = leaf_size;
    ctx->width = width;
    ctx->centroid.resize(static_cast<size_t>(n) * 3);
    for (size_t i = 0; i < static_cast<size_t>(n) * 3; ++i) {
        ctx->centroid[i] = 0.5f * (lo[i] + hi[i]);
    }
    ctx->order.resize(n);
    for (int32_t i = 0; i < n; ++i) ctx->order[i] = i;
    ctx->prim_order.reserve(n);

    std::vector<WorkItem> stack;
    const int root = alloc_node(*ctx);
    fill_node(*ctx, root, ctx->order.data(), ctx->order.data() + n, stack);
    while (!stack.empty()) {
        WorkItem it = stack.back();
        stack.pop_back();
        fill_node(*ctx, it.node, it.first, it.last, stack);
    }
    return static_cast<int32_t>(ctx->child_meta.size() / (3 * ctx->width));
}

void bvh_copy_out(float* child_box, int32_t* child_meta, int32_t* prim_order) {
    BuildContext* ctx = g_last;
    std::memcpy(child_box, ctx->child_box.data(), ctx->child_box.size() * 4);
    std::memcpy(child_meta, ctx->child_meta.data(), ctx->child_meta.size() * 4);
    std::memcpy(prim_order, ctx->prim_order.data(), ctx->prim_order.size() * 4);
    delete ctx;
    g_last = nullptr;
}

}  // extern "C"
