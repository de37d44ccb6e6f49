/* deepfilternet_tpu C client — the C-API surface (reference: capi.rs
 * df_create/df_process_frame/df_free) for the TPU stream server.
 *
 * The reference embeds its runtime in-process; a TPU is a shared
 * accelerator, so the C surface connects to the frame-streaming server
 * (deepfilternet_tpu.serve) over TCP and exchanges 48 kHz float32 hops.
 *
 *   DfClient *df = df_create("127.0.0.1", 7860);
 *   size_t frame = df_get_frame_length(df);          // samples per hop
 *   df_process_frame(df, in, out, frame);            // blocking, 1 hop
 *   df_free(df);
 *
 * Link: cc app.c native/df_client.c -o app
 */

#ifndef DF_CLIENT_H
#define DF_CLIENT_H

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct DfClient DfClient;

/* Connect to a stream server; NULL on failure. */
DfClient *df_create(const char *host, int port);

/* Samples per frame expected by df_process_frame (the model hop size). */
size_t df_get_frame_length(const DfClient *df);

/* Enhance one or more whole hops: n must be a multiple of the frame
 * length. Returns 0 on success, -1 on protocol/socket error. `output`
 * receives n samples (delayed by fft-hop as in the reference runtime). */
int df_process_frame(DfClient *df, const float *input, float *output, size_t n);

/* Close the stream and release the client. */
void df_free(DfClient *df);

#ifdef __cplusplus
}
#endif

#endif /* DF_CLIENT_H */
