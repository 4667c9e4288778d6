package graft.core

import org.apache.spark.sql.{Column, Encoder}
import scala.concurrent.Future
import scala.concurrent.duration.Duration

/** Argless currying sugar — the reference's `Partial` (reference:
  * pypeln/utils.py:87-98): `pl.map(f)` called WITHOUT a stage returns a
  * reusable partial that is later applied to any stage (`data | pl.map(f)`).
  * The Scala form: [[Graft.map]] etc. build a [[Partial]] — a named,
  * composable `GraftStage[A] => GraftStage[B]` — so pipelines can be
  * defined before any data exists and reused across stages:
  *
  * {{{
  * val pipeline = Graft.map[Int, Int](_ * 2) |> Graft.filter(_ % 3 != 0)
  * stageA |> pipeline
  * stageB |> pipeline        // same partial, reused
  * }}}
  *
  * `Partial` extends `Function1`, so the existing `stage |> partial`
  * pipe (GraftStage.|>) applies it with no new syntax.
  */
final case class Partial[A, B](run: GraftStage[A] => GraftStage[B])
    extends (GraftStage[A] => GraftStage[B]) {
  def apply(s: GraftStage[A]): GraftStage[B] = run(s)

  /** Compose stage-functions before any stage exists — the reference
    * composes partials with `|` the same way (pypeln/utils.py:74-75). */
  def |>[C](next: GraftStage[B] => GraftStage[C]): Partial[A, C] =
    Partial(run.andThen(next))
}

/** Stage-free constructors mirroring the reference's module-level API
  * (`pl.map` / `pl.flat_map` / `pl.filter` / `pl.each` / `pl.ordered`
  * with no stage argument → Partial). Encoders resolve at construction
  * time, so a Partial is self-contained and serialization-free. */
object Graft {
  def map[A, B](f: A => B)(
      implicit eb: Encoder[B], ee: Encoder[Element[B]]): Partial[A, B] =
    Partial(_.map(f))

  def flatMap[A, B](f: A => IterableOnce[B])(
      implicit eb: Encoder[B], ee: Encoder[Element[B]]): Partial[A, B] =
    Partial(_.flatMap(f))

  def filter[A](p: A => Boolean): Partial[A, A] = Partial(_.filter(p))

  def filterCol[A](c: Column): Partial[A, A] = Partial(_.filterCol(c))

  def each[A](f: A => Unit): Partial[A, A] = Partial(_.each(f))

  def mapAsync[A, B](f: A => Future[B], workers: Int = 8,
      timeout: Duration = GraftStage.DefaultAsyncTimeout)(
      implicit eb: Encoder[B], ee: Encoder[Element[B]]): Partial[A, B] =
    Partial(_.mapAsync(f, workers, timeout))

  def ordered[A](implicit ea: Encoder[A]): Partial[A, A] = Partial(_.ordered)
}
