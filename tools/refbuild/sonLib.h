/*
 * Minimal sonLib shim — JUST the surface /root/reference consumes
 * (enumerated in SURVEY.md section 2.5; the real sonLib submodule is not
 * checked out in the reference snapshot, /root/reference/.gitmodules:1-3).
 *
 * Purpose: build the reference paffy/faffy binaries so the golden snapshot
 * gate can byte-diff OUR output against the REFERENCE's (VERDICT r2
 * missing #2), instead of hashing our own output.
 *
 * Where real sonLib behavior is implementation-defined, this shim makes the
 * deterministic choice and documents it:
 *   - stHash iteration order = key insertion order (real sonLib: bucket
 *     order of its chained hash — unknowable without the submodule);
 *   - stList_sort is stable (glibc qsort is mergesort in practice; the
 *     reference's tile comparator returns 0 on ties, impl/paf_tile.c:28-34);
 *   - fastaWrite emits the sequence unwrapped on one line (formatting only;
 *     readers on both sides are wrap-agnostic).
 * Everything else (containers, sorted-set iteration, header codec, line
 * reading) follows the semantics the reference's call sites require — see
 * sonlib_shim.cpp for the per-function notes.
 */

#ifndef SONLIB_SHIM_H_
#define SONLIB_SHIM_H_

#include <assert.h>
#include <inttypes.h>
#include <limits.h>
#include <math.h>
#include <stdarg.h>
#include <stdbool.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct _stList stList;
typedef struct _stHash stHash;
typedef struct _stHashIterator stHashIterator;
typedef struct _stSortedSet stSortedSet;
typedef struct _stSortedSetIterator stSortedSetIterator;
typedef struct _stIntTuple stIntTuple;

/* ---- memory ---- */
void *st_malloc(size_t size);
void *st_calloc(int64_t num, size_t size);

/* ---- logging (levels compare with >=, e.g. impl/paf_tile.c:68) ---- */
enum stLogLevel { off = 0, critical = 1, info = 2, debug = 3 };
void st_setLogLevelFromString(const char *level);
int64_t st_getLogLevel(void);
void st_logInfo(const char *fmt, ...);
void st_logDebug(const char *fmt, ...);
void st_logCritical(const char *fmt, ...);
void st_errAbort(const char *fmt, ...);
void st_uglyf(const char *fmt, ...);

/* ---- strings ---- */
char *stString_copy(const char *s);
char *stString_print(const char *fmt, ...);
stList *stString_split(const char *s);
stList *stString_splitByString(const char *s, const char *sep);
char *stString_getSubString(const char *s, int64_t start, int64_t length);
char stString_reverseComplementChar(char c);

/* ---- files ---- */
char *stFile_getLineFromFile(FILE *f);
int64_t stFile_getLineFromFileWithBufferUnlocked(char **buffer,
                                                 int64_t *bufferLen, FILE *f);
bool stFile_exists(const char *path);
bool stFile_isDir(const char *path);
void stFile_mkdir(const char *path);
stList *stFile_getFileNamesInDirectory(const char *dir);

/* ---- stList ---- */
stList *stList_construct(void);
stList *stList_construct3(int64_t size, void (*destructItem)(void *));
int64_t stList_length(stList *l);
void *stList_get(stList *l, int64_t i);
void stList_append(stList *l, void *item);
void stList_appendAll(stList *to, stList *from);
void *stList_peek(stList *l);
void *stList_pop(stList *l);
void stList_sort(stList *l, int (*cmp)(const void *a, const void *b));
void stList_setDestructor(stList *l, void (*destructItem)(void *));
void *stList_binarySearch(stList *l, void *item,
                          int (*cmp)(const void *a, const void *b));
void stList_destruct(stList *l);

/* ---- stHash ---- */
stHash *stHash_construct2(void (*destructKeys)(void *),
                          void (*destructValues)(void *));
stHash *stHash_construct3(uint64_t (*hashKey)(const void *),
                          int (*equalsKey)(const void *, const void *),
                          void (*destructKeys)(void *),
                          void (*destructValues)(void *));
void stHash_insert(stHash *h, void *key, void *value);
void *stHash_search(stHash *h, void *key);
int64_t stHash_size(stHash *h);
stHashIterator *stHash_getIterator(stHash *h);
void *stHash_getNext(stHashIterator *it);
void stHash_destructIterator(stHashIterator *it);
void stHash_destruct(stHash *h);
uint64_t stHash_stringKey(const void *k);
int stHash_stringEqualKey(const void *key1, const void *key2);

/* ---- stSortedSet (iterator model matches libavl traversers: one null
 * position whose next is the first item and whose previous is the last —
 * required by get_predecessor_chains, impl/chaining.c:71-86) ---- */
stSortedSet *stSortedSet_construct3(int (*compareFn)(const void *, const void *),
                                    void (*destructItem)(void *));
void stSortedSet_insert(stSortedSet *s, void *item);
void *stSortedSet_remove(stSortedSet *s, void *item);
void *stSortedSet_search(stSortedSet *s, void *item);
void *stSortedSet_searchLessThanOrEqual(stSortedSet *s, void *item);
void *stSortedSet_getLast(stSortedSet *s);
int64_t stSortedSet_size(stSortedSet *s);
stSortedSetIterator *stSortedSet_getIterator(stSortedSet *s);
stSortedSetIterator *stSortedSet_getIteratorFrom(stSortedSet *s, void *item);
void *stSortedSet_getNext(stSortedSetIterator *it);
void *stSortedSet_getPrevious(stSortedSetIterator *it);
void stSortedSet_destructIterator(stSortedSetIterator *it);
void stSortedSet_destruct(stSortedSet *s);

/* ---- stIntTuple ---- */
stIntTuple *stIntTuple_construct1(int64_t i);
int64_t stIntTuple_get(stIntTuple *t, int64_t idx);
void stIntTuple_destruct(stIntTuple *t);

#ifdef __cplusplus
}
#endif

#endif
