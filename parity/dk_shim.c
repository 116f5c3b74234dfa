/* Parity-oracle shim over AlexeyAB darknet (CPU build).
 *
 * Role: the native boundary of the reference's darknet-test harness
 * (darknet-test/src/darknet/network.rs wraps the same library via FFI).
 * Exposes a minimal flat-C API so python/ctypes can run a cfg+weights pair
 * and read every layer's raw output feature map for MSE comparison against
 * the JAX model (darknet-test/src/main.rs:112-195 behavior).
 *
 * Built against the vendored darknet headers; link with libdarknet.so.
 */

#include <stdlib.h>
#include <string.h>

#include "darknet.h"

/* internal struct access: network/layer are fully defined in darknet.h */

network *dk_load(const char *cfg, const char *weights, int batch) {
    return load_network_custom((char *)cfg, (char *)weights, /*clear=*/1, batch);
}

/* training-capable load: parse_network_cfg_custom(cfg, 0, 0) allocates the
 * delta/weight_updates buffers (parser.c:1342-1343 sets params.train=1 only
 * when batch==0); batch comes from the cfg's [net] batch/subdivisions */
network *dk_load_train(const char *cfg, const char *weights) {
    return load_network((char *)cfg, (char *)weights, /*clear=*/1);
}

void dk_free(network *net) { free_network_ptr(net); }

int dk_num_layers(network *net) { return net->n; }
int dk_input_w(network *net) { return net->w; }
int dk_input_h(network *net) { return net->h; }
int dk_input_c(network *net) { return net->c; }

/* run one forward pass; input is CHW float32 of size c*h*w */
void dk_forward(network *net, float *input) {
    network_predict_ptr(net, input);
}

int dk_layer_type(network *net, int i) { return (int)net->layers[i].type; }
int dk_layer_out_w(network *net, int i) { return net->layers[i].out_w; }
int dk_layer_out_h(network *net, int i) { return net->layers[i].out_h; }
int dk_layer_out_c(network *net, int i) { return net->layers[i].out_c; }
int dk_layer_outputs(network *net, int i) { return net->layers[i].outputs; }

/* copy layer i's output (batch 1) into caller-provided buffer */
int dk_layer_output(network *net, int i, float *out, int capacity) {
    layer *l = &net->layers[i];
    int n = l->outputs;
    if (n > capacity) return -1;
    memcpy(out, l->output, (size_t)n * sizeof(float));
    return n;
}

/* ---- training oracle ----------------------------------------------------
 * Role of darknet-test extended to the backward pass: run real darknet-C
 * SGD training steps on a fixed batch and expose per-layer weights so the
 * framework's gradients + optimizer semantics can be compared value-for-
 * value (training-side analogue of darknet-test/src/main.rs:112-195).
 * These symbols are exported by libdarknet.so but not declared in darknet.h.
 */
float train_network(network net, data d);
float get_current_rate(network net);

/* One darknet training iteration: rows/net->batch forward+backward
 * sub-batches accumulating weight_updates, then one SGD update
 * (network.c train_network_waitkey).  X: rows x x_cols (CHW f32),
 * y: rows x y_cols truth.  Returns darknet's reported cost. */
float dk_train(network *net, float *X, float *y, int rows, int x_cols,
               int y_cols) {
    data d;
    memset(&d, 0, sizeof(d));
    d.shallow = 1;
    d.X.rows = rows;
    d.X.cols = x_cols;
    d.y.rows = rows;
    d.y.cols = y_cols;
    float **xr = (float **)calloc(rows, sizeof(float *));
    float **yr = (float **)calloc(rows, sizeof(float *));
    for (int i = 0; i < rows; ++i) {
        xr[i] = X + (size_t)i * x_cols;
        yr[i] = y + (size_t)i * y_cols;
    }
    d.X.vals = xr;
    d.y.vals = yr;
    float err = train_network(*net, d);
    free(xr);
    free(yr);
    return err;
}

float dk_current_rate(network *net) { return get_current_rate(*net); }
long dk_seen(network *net) { return (long)(*net->seen); }

int dk_layer_nweights(network *net, int i) { return net->layers[i].nweights; }
int dk_layer_nfilters(network *net, int i) { return net->layers[i].n; }

static int copy_buf(float *src, int n, float *out, int capacity) {
    if (!src || n > capacity) return -1;
    memcpy(out, src, (size_t)n * sizeof(float));
    return n;
}

int dk_layer_weights(network *net, int i, float *out, int cap) {
    return copy_buf(net->layers[i].weights, net->layers[i].nweights, out, cap);
}
int dk_layer_biases(network *net, int i, float *out, int cap) {
    return copy_buf(net->layers[i].biases, net->layers[i].n, out, cap);
}
int dk_layer_scales(network *net, int i, float *out, int cap) {
    return copy_buf(net->layers[i].scales, net->layers[i].n, out, cap);
}
int dk_layer_rolling_mean(network *net, int i, float *out, int cap) {
    return copy_buf(net->layers[i].rolling_mean, net->layers[i].n, out, cap);
}
int dk_layer_rolling_variance(network *net, int i, float *out, int cap) {
    return copy_buf(net->layers[i].rolling_variance, net->layers[i].n, out,
                    cap);
}

/* final detections through darknet's own decode + NMS-free extraction.
 * Writes up to capacity rows of (x, y, w, h, objectness, best_class,
 * best_prob) into out (7 floats per row); returns the row count. */
int dk_detections(network *net, int img_w, int img_h, float thresh,
                  float *out, int capacity) {
    int num = 0;
    detection *dets =
        get_network_boxes(net, img_w, img_h, thresh, 0.5f, NULL, 1, &num, 0);
    int written = 0;
    for (int i = 0; i < num && written < capacity; ++i) {
        float best_prob = 0.f;
        int best_class = -1;
        for (int c = 0; c < dets[i].classes; ++c) {
            if (dets[i].prob[c] > best_prob) {
                best_prob = dets[i].prob[c];
                best_class = c;
            }
        }
        float *row = out + (size_t)written * 7;
        row[0] = dets[i].bbox.x;
        row[1] = dets[i].bbox.y;
        row[2] = dets[i].bbox.w;
        row[3] = dets[i].bbox.h;
        row[4] = dets[i].objectness;
        row[5] = (float)best_class;
        row[6] = best_prob;
        ++written;
    }
    free_detections(dets, num);
    return written;
}

/* ---- detection-loss oracle extensions -----------------------------------
 * Truth layout + raw per-layer training deltas, for pinning the
 * darknet-exact [yolo]/[gaussian_yolo] loss (yolo_layer.c process_batch /
 * gaussian_yolo_layer.c forward) value-for-value. */
int dk_layer_truths(network *net, int i) { return net->layers[i].truths; }
int dk_layer_truth_size(network *net, int i) {
    return net->layers[i].truth_size;
}
int dk_layer_delta(network *net, int i, float *out, int cap) {
    layer *l = &net->layers[i];
    return copy_buf(l->delta, l->outputs * l->batch, out, cap);
}
float dk_layer_cost(network *net, int i) {
    return net->layers[i].cost ? net->layers[i].cost[0] : -1.0f;
}
