/* LADSPA plugin for deepfilternet_tpu: restores the reference's
 * LADSPA/PipeWire deployment surface (reference: ladspa/src/lib.rs,
 * plugins deep_filter_mono / deep_filter_stereo, min latency 20 ms,
 * ladspa/README.md:3) on top of the TPU stream server.
 *
 * The reference embeds its Rust runtime in the plugin process; a TPU is a
 * shared accelerator, so this plugin ring-buffers host audio into whole
 * 10 ms hops and speaks the df_client wire protocol to a local
 * deepfilternet_tpu.serve server (one stream per channel, dynamically
 * batched server-side with every other active client).
 *
 * Latency: one hop of plugin buffering + the runtime's fft-hop algorithmic
 * delay = 960 samples = 20 ms at 48 kHz, matching the reference plugin's
 * minimum. Reported through the "latency" control output port.
 *
 * Server address: env DF_SERVER_HOST / DF_SERVER_PORT (default
 * 127.0.0.1:7860). If the server is unreachable the plugin runs in
 * bypass (copies input to output) and warns once on stderr, mirroring
 * the reference's graceful-degradation behavior. Runtime knobs
 * (attenuation limit, post-filter, LSNR thresholds) are server-side
 * configuration (serve.py RuntimeParams); the wire protocol carries
 * audio only.
 *
 * Build: make -C native ladspa_df.so
 * PipeWire: see native/pipewire_deep_filter.conf.
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "df_client.h"
#include "ladspa.h"

#define HOP 480u
#define MAX_CH 2u
#define FIFO_CAP (8u * HOP)

typedef struct {
  unsigned nch;
  DfClient *client[MAX_CH];
  LADSPA_Data *port_in[MAX_CH];
  LADSPA_Data *port_out[MAX_CH];
  LADSPA_Data *port_latency;
  float in_fifo[MAX_CH][FIFO_CAP];
  float out_fifo[MAX_CH][FIFO_CAP];
  size_t in_len;
  size_t out_len;
  int bypass;
  int warned;
} DfPlugin;

static LADSPA_Handle df_instantiate_n(unsigned nch) {
  DfPlugin *p = (DfPlugin *)calloc(1, sizeof(DfPlugin));
  if (!p) return NULL;
  p->nch = nch;
  const char *host = getenv("DF_SERVER_HOST");
  const char *port_s = getenv("DF_SERVER_PORT");
  int port = port_s ? atoi(port_s) : 7860;
  if (!host) host = "127.0.0.1";
  for (unsigned c = 0; c < nch; c++) {
    p->client[c] = df_create(host, port);
    if (!p->client[c]) {
      for (unsigned k = 0; k < c; k++) df_free(p->client[k]);
      p->bypass = 1;
      break;
    }
  }
  return p;
}

static LADSPA_Handle df_instantiate_mono(const LADSPA_Descriptor *d,
                                         unsigned long sr) {
  (void)d;
  (void)sr; /* model is 48 kHz; hosts resample via their graph config */
  return df_instantiate_n(1);
}

static LADSPA_Handle df_instantiate_stereo(const LADSPA_Descriptor *d,
                                           unsigned long sr) {
  (void)d;
  (void)sr;
  return df_instantiate_n(2);
}

static void df_connect_port(LADSPA_Handle h, unsigned long port,
                            LADSPA_Data *loc) {
  DfPlugin *p = (DfPlugin *)h;
  unsigned n = p->nch;
  if (port < n)
    p->port_in[port] = loc;
  else if (port < 2 * n)
    p->port_out[port - n] = loc;
  else
    p->port_latency = loc;
}

static void df_activate(LADSPA_Handle h) {
  DfPlugin *p = (DfPlugin *)h;
  p->in_len = 0;
  /* prime one hop of silence so run() can always emit SampleCount
   * samples; total plugin latency = HOP + (fft - hop) = 960 */
  p->out_len = HOP;
  for (unsigned c = 0; c < p->nch; c++)
    memset(p->out_fifo[c], 0, HOP * sizeof(float));
}

static void df_run(LADSPA_Handle h, unsigned long n) {
  DfPlugin *p = (DfPlugin *)h;
  if (p->port_latency) *p->port_latency = (LADSPA_Data)(2 * HOP);
  if (p->bypass) {
    if (!p->warned) {
      fprintf(stderr,
              "deep_filter ladspa: stream server unreachable, bypassing\n");
      p->warned = 1;
    }
    for (unsigned c = 0; c < p->nch; c++)
      if (p->port_in[c] && p->port_out[c])
        memcpy(p->port_out[c], p->port_in[c], n * sizeof(float));
    return;
  }
  unsigned long done = 0;
  while (done < n) {
    /* push as much input as fits before the next hop boundary */
    size_t room = FIFO_CAP - p->in_len;
    size_t take = n - done < room ? n - done : room;
    for (unsigned c = 0; c < p->nch; c++)
      memcpy(p->in_fifo[c] + p->in_len, p->port_in[c] + done,
             take * sizeof(float));
    p->in_len += take;

    /* process whole hops */
    size_t off = 0;
    while (p->in_len - off >= HOP && p->out_len + HOP <= FIFO_CAP) {
      for (unsigned c = 0; c < p->nch; c++) {
        if (df_process_frame(p->client[c], p->in_fifo[c] + off,
                             p->out_fifo[c] + p->out_len, HOP) != 0) {
          p->bypass = 1;
          df_run(h, n); /* re-enter in bypass for this block */
          return;
        }
      }
      p->out_len += HOP;
      off += HOP;
    }
    if (off > 0) {
      for (unsigned c = 0; c < p->nch; c++)
        memmove(p->in_fifo[c], p->in_fifo[c] + off,
                (p->in_len - off) * sizeof(float));
      p->in_len -= off;
    }

    /* pop output */
    size_t want = n - done;
    size_t give = want < p->out_len ? want : p->out_len;
    for (unsigned c = 0; c < p->nch; c++) {
      memcpy(p->port_out[c] + done, p->out_fifo[c], give * sizeof(float));
      memmove(p->out_fifo[c], p->out_fifo[c] + give,
              (p->out_len - give) * sizeof(float));
    }
    p->out_len -= give;
    done += give;
    if (give == 0 && take == 0) { /* cannot make progress (host block
                                     larger than FIFO_CAP) */
      for (unsigned c = 0; c < p->nch; c++)
        memset(p->port_out[c] + done, 0, (n - done) * sizeof(float));
      return;
    }
  }
}

static void df_cleanup(LADSPA_Handle h) {
  DfPlugin *p = (DfPlugin *)h;
  if (!p) return;
  if (!p->bypass)
    for (unsigned c = 0; c < p->nch; c++)
      if (p->client[c]) df_free(p->client[c]);
  free(p);
}

/* ---- descriptors ------------------------------------------------------- */

static const LADSPA_PortDescriptor MONO_PORTS[3] = {
    LADSPA_PORT_INPUT | LADSPA_PORT_AUDIO,
    LADSPA_PORT_OUTPUT | LADSPA_PORT_AUDIO,
    LADSPA_PORT_OUTPUT | LADSPA_PORT_CONTROL,
};
static const char *const MONO_NAMES[3] = {"Input", "Output", "latency"};
static const LADSPA_PortRangeHint MONO_HINTS[3] = {{0, 0, 0}, {0, 0, 0},
                                                   {0, 0, 0}};

static const LADSPA_PortDescriptor STEREO_PORTS[5] = {
    LADSPA_PORT_INPUT | LADSPA_PORT_AUDIO,
    LADSPA_PORT_INPUT | LADSPA_PORT_AUDIO,
    LADSPA_PORT_OUTPUT | LADSPA_PORT_AUDIO,
    LADSPA_PORT_OUTPUT | LADSPA_PORT_AUDIO,
    LADSPA_PORT_OUTPUT | LADSPA_PORT_CONTROL,
};
static const char *const STEREO_NAMES[5] = {"Input L", "Input R", "Output L",
                                            "Output R", "latency"};
static const LADSPA_PortRangeHint STEREO_HINTS[5] = {
    {0, 0, 0}, {0, 0, 0}, {0, 0, 0}, {0, 0, 0}, {0, 0, 0}};

static const LADSPA_Descriptor DESCRIPTORS[2] = {
    {
        .UniqueID = 56781,
        .Label = "deep_filter_mono",
        .Properties = 0,
        .Name = "DeepFilterNet (TPU) noise suppression — mono",
        .Maker = "deepfilternet_tpu",
        .Copyright = "MIT",
        .PortCount = 3,
        .PortDescriptors = MONO_PORTS,
        .PortNames = MONO_NAMES,
        .PortRangeHints = MONO_HINTS,
        .ImplementationData = NULL,
        .instantiate = df_instantiate_mono,
        .connect_port = df_connect_port,
        .activate = df_activate,
        .run = df_run,
        .run_adding = NULL,
        .set_run_adding_gain = NULL,
        .deactivate = NULL,
        .cleanup = df_cleanup,
    },
    {
        .UniqueID = 56782,
        .Label = "deep_filter_stereo",
        .Properties = 0,
        .Name = "DeepFilterNet (TPU) noise suppression — stereo",
        .Maker = "deepfilternet_tpu",
        .Copyright = "MIT",
        .PortCount = 5,
        .PortDescriptors = STEREO_PORTS,
        .PortNames = STEREO_NAMES,
        .PortRangeHints = STEREO_HINTS,
        .ImplementationData = NULL,
        .instantiate = df_instantiate_stereo,
        .connect_port = df_connect_port,
        .activate = df_activate,
        .run = df_run,
        .run_adding = NULL,
        .set_run_adding_gain = NULL,
        .deactivate = NULL,
        .cleanup = df_cleanup,
    },
};

const LADSPA_Descriptor *ladspa_descriptor(unsigned long index) {
  return index < 2 ? &DESCRIPTORS[index] : NULL;
}
