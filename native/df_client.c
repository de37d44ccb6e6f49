/* See df_client.h. Wire protocol: deepfilternet_tpu/serve.py. */

#include "df_client.h"

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <sys/socket.h>
#include <unistd.h>

#define DF_MAGIC 0x44465331u
#define DF_DEFAULT_HOP 480u

struct DfClient {
  int fd;
  size_t hop;
};

static int send_all(int fd, const void *buf, size_t n) {
  const char *p = (const char *)buf;
  while (n > 0) {
    ssize_t w = send(fd, p, n, 0);
    if (w <= 0) return -1;
    p += w;
    n -= (size_t)w;
  }
  return 0;
}

static int recv_all(int fd, void *buf, size_t n) {
  char *p = (char *)buf;
  while (n > 0) {
    ssize_t r = recv(fd, p, n, 0);
    if (r <= 0) return -1;
    p += r;
    n -= (size_t)r;
  }
  return 0;
}

DfClient *df_create(const char *host, int port) {
  int fd = socket(AF_INET, SOCK_STREAM, 0);
  if (fd < 0) return NULL;
  int one = 1;
  setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
  struct sockaddr_in addr;
  memset(&addr, 0, sizeof(addr));
  addr.sin_family = AF_INET;
  addr.sin_port = htons((uint16_t)port);
  if (inet_pton(AF_INET, host, &addr.sin_addr) != 1 ||
      connect(fd, (struct sockaddr *)&addr, sizeof(addr)) != 0) {
    close(fd);
    return NULL;
  }
  uint32_t magic = DF_MAGIC;
  if (send_all(fd, &magic, 4) != 0) {
    close(fd);
    return NULL;
  }
  DfClient *df = (DfClient *)calloc(1, sizeof(DfClient));
  df->fd = fd;
  df->hop = DF_DEFAULT_HOP;
  return df;
}

size_t df_get_frame_length(const DfClient *df) { return df ? df->hop : 0; }

int df_process_frame(DfClient *df, const float *input, float *output, size_t n) {
  if (!df || n == 0 || n % df->hop != 0) return -1;
  uint32_t len = (uint32_t)n;
  if (send_all(df->fd, &len, 4) != 0) return -1;
  if (send_all(df->fd, input, n * sizeof(float)) != 0) return -1;
  uint32_t out_n = 0;
  if (recv_all(df->fd, &out_n, 4) != 0) return -1;
  if (out_n != n) return -1; /* server rejected (partial hop) or resized */
  return recv_all(df->fd, output, n * sizeof(float));
}

void df_free(DfClient *df) {
  if (!df) return;
  uint32_t zero = 0;
  send_all(df->fd, &zero, 4);
  close(df->fd);
  free(df);
}
