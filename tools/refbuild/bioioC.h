/* bioioC shim: the FASTA I/O surface the reference consumes (SURVEY.md
 * section 2.5).  See sonLib.h for the shim rationale. */

#ifndef BIOIOC_SHIM_H_
#define BIOIOC_SHIM_H_

#include "sonLib.h"

#ifdef __cplusplus
extern "C" {
#endif

/* Stream a FASTA file, calling processSequence(destination, header, seq,
 * strlen(seq)) per record.  The header is the full '>' line minus the
 * leading '>' and trailing whitespace (paffy looks sequences up by PAF name,
 * impl/paf_view.c:151-167 — test FASTAs use bare names). */
void fastaReadToFunction(FILE *fasta, void *destination,
                         void (*processSequence)(void *, const char *,
                                                 const char *, int64_t));

/* Callback for fastaReadToFunction: insert copies into an stHash
 * (name -> sequence), as used at impl/paf_view.c:132. */
void fastaRead_readToMapFunction(void *destination, const char *fastaHeader,
                                 const char *string, int64_t length);

/* Write one record.  Shim formatting choice: sequence unwrapped on a single
 * line (readers on both sides are wrap-agnostic; the reference's own merge
 * emits unwrapped lines, impl/fasta_merge.c:49,77). */
void fastaWrite(char *sequence, char *header, FILE *file);

/* 'name|a|b' attribute codec (split/join on '|'),
 * used by impl/paf.c:716-731 and impl/fasta_merge.c:43-62. */
char *fastaEncodeHeader(stList *attributes);
stList *fastaDecodeHeader(const char *fastaHeader);

#ifdef __cplusplus
}
#endif

#endif
