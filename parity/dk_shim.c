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
