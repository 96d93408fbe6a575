// fastq_core: native host-side FASTQ runtime.
//
// The TPU device pipeline consumes struct-of-array packs; this module is the
// native replacement for the per-record host work around it -- tokenizing
// FASTQ text into record spans, packing bases/qualities into fixed-shape
// matrices, and re-materializing output records from (select, start, len)
// index arithmetic.  It plays the role of the reference's FqReader/Writer hot
// loops (reference: src/fqreader.cpp:90-195, src/read.h:166-176) as a
// zero-copy batch transform.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libfastq_core.so fastq_core.cpp
// Exposed via ctypes (extern "C"), no Python.h dependency.

#include <cstdint>
#include <cstring>

extern "C" {

// Tokenize a FASTQ text buffer into up to max_records records.
//
// Semantics follow the reference reader (fqreader.cpp:160-195): blank lines
// and lines not starting with '@' are skipped while looking for a name line;
// '\r\n' and '\n' both terminate lines; a quality/sequence length mismatch
// stops the stream (returns the records parsed so far and sets *error = 1).
//
// Only complete records are consumed: *consumed is the byte offset just past
// the last complete record, so the caller can carry the tail over to the next
// buffer.  final_buffer != 0 means EOF follows this buffer and a trailing
// record without a final newline is accepted.
//
// Offsets/lengths are written per record for name (including '@'), sequence,
// strand line, and quality.
int64_t fq_parse(const char* buf, int64_t len, int64_t max_records,
                 int32_t final_buffer,
                 int64_t* name_off, int32_t* name_len,
                 int64_t* seq_off, int32_t* seq_len,
                 int64_t* strand_off, int32_t* strand_len,
                 int64_t* qual_off, int32_t* qual_len,
                 int64_t* consumed, int32_t* error) {
    int64_t pos = 0;
    int64_t n = 0;
    *error = 0;
    *consumed = 0;

    auto next_line = [&](int64_t& off, int64_t& llen) -> bool {
        if (pos >= len) return false;
        off = pos;
        const char* nl = (const char*)memchr(buf + pos, '\n', (size_t)(len - pos));
        int64_t end;
        if (nl == nullptr) {
            if (!final_buffer) return false;  // incomplete line, wait for more
            end = len;
            pos = len;
        } else {
            end = nl - buf;
            pos = end + 1;
        }
        // strip trailing \r (and a stray pre-\r like the reference's
        // clearLineBreaks, fqreader.cpp:77-88)
        while (end > off && buf[end - 1] == '\r') --end;
        llen = end - off;
        return true;
    };

    while (n < max_records) {
        int64_t noff = 0, nlen = 0;
        // scan for a name line
        bool have = false;
        while (next_line(noff, nlen)) {
            if (nlen > 0 && buf[noff] == '@') { have = true; break; }
        }
        if (!have) break;
        int64_t soff = 0, slen = 0, toff = 0, tlen = 0, qoff = 0, qlen = 0;
        if (!next_line(soff, slen)) break;
        if (!next_line(toff, tlen)) { if (!final_buffer) break; toff = soff + slen; tlen = 0; }
        if (!next_line(qoff, qlen)) {
            if (!final_buffer) break;
            qoff = toff + tlen; qlen = 0;
        }
        if (qlen != slen) {
            *error = 1;
            *consumed = pos;
            return n;
        }
        name_off[n] = noff; name_len[n] = (int32_t)nlen;
        seq_off[n] = soff; seq_len[n] = (int32_t)slen;
        strand_off[n] = toff; strand_len[n] = (int32_t)tlen;
        qual_off[n] = qoff; qual_len[n] = (int32_t)qlen;
        ++n;
        *consumed = pos;
    }
    return n;
}

// Pack sequence/quality spans into zero-padded [n, width] matrices.
// phred64 != 0 converts quality to phred33 clamped at 33 (read.h:71-75).
void fq_pack(const char* buf, int64_t n,
             const int64_t* seq_off, const int32_t* seq_len,
             const int64_t* qual_off,
             uint8_t* seq_out, uint8_t* qual_out, int64_t width,
             int32_t phred64) {
    for (int64_t i = 0; i < n; ++i) {
        int32_t l = seq_len[i];
        if (l > width) l = (int32_t)width;
        uint8_t* srow = seq_out + i * width;
        uint8_t* qrow = qual_out + i * width;
        memcpy(srow, buf + seq_off[i], (size_t)l);
        memset(srow + l, 0, (size_t)(width - l));
        memcpy(qrow, buf + qual_off[i], (size_t)l);
        memset(qrow + l, 0, (size_t)(width - l));
        if (phred64) {
            for (int32_t j = 0; j < l; ++j) {
                int q = (int)qrow[j] - 31;
                qrow[j] = (uint8_t)(q < 33 ? 33 : q);
            }
        }
    }
}

// Byte count needed by fq_format for the selected records.
int64_t fq_format_size(int64_t n, const uint8_t* select,
                       const char* names_buf,  // unused, kept for symmetry
                       const int32_t* name_len,
                       const int32_t* strand_len,
                       const int32_t* out_len,
                       const int32_t* tag_len) {
    (void)names_buf;
    int64_t total = 0;
    for (int64_t i = 0; i < n; ++i) {
        if (!select[i]) continue;
        total += (int64_t)name_len[i] + 1 + out_len[i] + 1 + strand_len[i] + 1
                 + out_len[i] + 1;
        if (tag_len) total += tag_len[i] ? (int64_t)tag_len[i] + 1 : 0;
    }
    return total;
}

// Materialize 4-line FASTQ records (read.h:166-176) for every selected read:
//   name [+ " " tag] \n  seq[start:start+len] \n  strand \n  qual[...] \n
// seq/qual come from [n, width] matrices; names/strands/tags from
// concatenated buffers with per-record offsets.  Returns bytes written.
int64_t fq_format(int64_t n, const uint8_t* select,
                  const char* names_buf, const int64_t* name_off, const int32_t* name_len,
                  const char* strands_buf, const int64_t* strand_off, const int32_t* strand_len,
                  const uint8_t* seq, const uint8_t* qual, int64_t width,
                  const int32_t* start, const int32_t* out_len,
                  const char* tags_buf, const int64_t* tag_off, const int32_t* tag_len,
                  char* out) {
    char* p = out;
    for (int64_t i = 0; i < n; ++i) {
        if (!select[i]) continue;
        memcpy(p, names_buf + name_off[i], (size_t)name_len[i]);
        p += name_len[i];
        if (tags_buf && tag_len[i]) {
            *p++ = ' ';
            memcpy(p, tags_buf + tag_off[i], (size_t)tag_len[i]);
            p += tag_len[i];
        }
        *p++ = '\n';
        int64_t s = start[i];
        int32_t l = out_len[i];
        memcpy(p, seq + i * width + s, (size_t)l);
        p += l;
        *p++ = '\n';
        memcpy(p, strands_buf + strand_off[i], (size_t)strand_len[i]);
        p += strand_len[i];
        *p++ = '\n';
        memcpy(p, qual + i * width + s, (size_t)l);
        p += l;
        *p++ = '\n';
    }
    return p - out;
}

}  // extern "C"
